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

A real protobuf install still wins: every OTHER ``google`` package
directory on sys.path is part of ``__path__``, so ``google.protobuf``
resolves natively when one exists and the shim's native probe
short-circuits. r9 (ADVICE): ``__path__`` is no longer a one-time
snapshot — it RESCANS sys.path on every iteration (the dynamic
analogue of ``pkgutil.extend_path``), so google.* distributions
reachable only via sys.path entries added AFTER this package's first
import still resolve.
"""

import os as _os
import sys as _sys

_here = _os.path.dirname(_os.path.abspath(__file__))


class _SysPathTrackingPath(list):
    """Package ``__path__`` that recomputes from sys.path on every
    iteration (the import machinery iterates ``__path__`` on each
    submodule lookup, so late sys.path additions are honored).

    Manually-appended entries are tracked SEPARATELY in ``_extras``
    (r10, ADVICE): the rescan rebuilds strictly from ``_here`` +
    current sys.path + ``_extras``, so a google/ dir that was only
    reachable via a since-removed sys.path entry stops resolving —
    previously it was folded into the list on first scan and became
    indistinguishable from a manual append, persisting forever.
    """

    def __init__(self, initial):
        list.__init__(self, initial)
        # front extras (insert(0, ...)) are emitted right after _here,
        # BEFORE sys.path-scanned dirs, so an explicit priority insert
        # actually shadows scanned packages; back extras come last.
        self._extras_front: "list[str]" = []
        self._extras: "list[str]" = []

    def _known(self, entry) -> bool:
        return entry in self._extras or entry in self._extras_front

    def append(self, entry):  # pkgutil-style manual extension
        if not self._known(entry):
            self._extras.append(entry)
        self._rescan()

    def extend(self, entries):
        for e in entries:
            if not self._known(e):
                self._extras.append(e)
        self._rescan()

    def __iadd__(self, entries):
        # `google.__path__ += [...]` — CPython's list.__iadd__ would
        # mutate the underlying list directly, bypassing extend(), and
        # the next rescan would wipe the entry. Route it through
        # extend() so the addition persists.
        self.extend(entries)
        return self

    def insert(self, index, entry):
        if not self._known(entry):
            if index <= 0:
                self._extras_front.insert(0, entry)
            else:
                self._extras.append(entry)
        self._rescan()

    def _rescan(self) -> "list[str]":
        seen = {_here}
        fresh = [_here]
        for extra in self._extras_front:
            if extra not in seen:
                seen.add(extra)
                fresh.append(extra)
        for _p in list(_sys.path):
            cand = _os.path.abspath(_os.path.join(_p or ".", "google"))
            if cand not in seen and _os.path.isdir(cand):
                seen.add(cand)
                fresh.append(cand)
        for extra in self._extras:
            if extra not in seen:
                seen.add(extra)
                fresh.append(extra)
        list.__delitem__(self, slice(None))
        list.extend(self, fresh)
        return fresh

    def __iter__(self):
        return list.__iter__(self._rescan())


__path__ = _SysPathTrackingPath(__path__)
__path__._rescan()

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
