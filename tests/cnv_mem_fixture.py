"""A fake ``mem://`` object store for the cnv DataSource portability
test — importable by name from Spark's Python workers, which is the
whole point: the DataSource resolves ``fetcher``/``lister`` options as
``"module:fn"`` references because no driver-side state (module
globals, pickled instances) reaches the worker processes.

The blob bytes come from the reference fixture file on disk, but the
*partition path* handed to the source is the opaque ``mem://`` URI —
the test proves the source never applies local ``open()`` to it.
"""

_REAL = "/root/reference/tests/data/small.cnv.bz2"

_STORE = {
    "mem://casts/a.cnv.bz2": _REAL,
    "mem://casts/skipme.txt": None,  # non-.cnv: the lister filter drops it
}


def fetch(path: str) -> bytes:
    src = _STORE.get(path)
    if src is None:
        raise KeyError(f"no such mem:// blob: {path}")
    with open(src, "rb") as f:
        return f.read()


def list_paths(path: str) -> list[str]:
    return [k for k in _STORE if k.startswith(path)]
