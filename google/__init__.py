"""Repo-root ``google`` bootstrap package (protobuf compat, part 2).

Why this exists: a VANILLA SparkSession (the driver's smoke-check
builds one directly, without ``amadou_spark.session.get_spark``)
launches its JVM before any PYTHONPATH arming, so the JVM-spawned
Python workers never see the sitecustomize arm of the protobuf shim
(``amadou_spark/compat/protobuf_compat.py``). In local mode, however,
those workers start as ``python -m pyspark.daemon`` with the JVM's cwd
— the repo root for the documented driver invocation — and ``-m``
puts the cwd at ``sys.path[0]``. So when worker code lazily runs
``from google.protobuf import descriptor``, THIS package resolves and
bootstraps the same meta-path shim the sitecustomize arm installs:
``google.protobuf`` is aliased to the machine's Google Cloud SDK
bundled pure-Python protobuf runtime (nothing vendored in the repo).

A real protobuf install still wins: any OTHER ``google`` package
directory on sys.path is appended to ``__path__`` first, so
``google.protobuf`` resolves natively when one exists and the shim's
native probe short-circuits.
"""

import os as _os
import sys as _sys

_here = _os.path.dirname(_os.path.abspath(__file__))
for _p in list(_sys.path):
    _cand = _os.path.join(_p or ".", "google")
    if _os.path.isdir(_cand) and _os.path.abspath(_cand) != _here:
        __path__.append(_cand)

try:
    _repo = _os.path.dirname(_here)
    if _repo not in _sys.path:
        _sys.path.insert(0, _repo)
    from amadou_spark.compat.protobuf_compat import install_protobuf_shim

    install_protobuf_shim()
except Exception:  # pragma: no cover - never break an unrelated import
    if _os.environ.get("AMADOU_SITE_DEBUG"):
        import traceback as _tb

        _tb.print_exc()
