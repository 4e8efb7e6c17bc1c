"""Worker-side arm of the protobuf shim (see ../protobuf_compat.py).

This directory is prepended to PYTHONPATH by ``session.get_spark``
(only when google.protobuf is missing and the cloudsdk copy exists), so
every spawned Python worker imports this module at interpreter startup
via the standard ``site`` mechanism and gets a working
``google.protobuf`` before pyspark's transformWithState client asks
for it. Everything is guarded: a failure here must never take down a
worker that wasn't going to touch protobuf anyway.
"""

try:
    import os
    import sys

    # __file__ = <repo>/amadou_spark/compat/worker_site/sitecustomize.py
    _repo = os.path.dirname(
        os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
    )
    if _repo not in sys.path:
        sys.path.insert(0, _repo)
    from amadou_spark.compat.protobuf_compat import install_protobuf_shim

    install_protobuf_shim()
except Exception:  # pragma: no cover - never break unrelated workers
    import os as _os

    if _os.environ.get("AMADOU_SITE_DEBUG"):
        import traceback as _tb

        _tb.print_exc()
