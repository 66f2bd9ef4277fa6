"""Scheme-aware blob access for the instrument-file sources.

The ``cnv`` DataSource originally opened ``partition.path`` with a bare
local ``open()``, which silently requires a filesystem shared between
driver and executors.  This module makes the path dispatch explicit and
extensible:

- bare paths and ``file://`` → local filesystem (``open``/``glob``)
- ``http://`` / ``https://`` → stdlib ``urllib`` fetch (no listing —
  point at files, not directories)
- any other scheme → a fetcher registered via :func:`register_scheme`
  (e.g. an object-store client).  The registry snapshot taken when the
  reader is *constructed on the driver* is pickled into the reader, so
  executors resolve the same fetchers without sharing module state —
  this is what makes ``spark.read.format("cnv")`` work where executors
  don't share the driver's filesystem.

Listing (for directory loads) runs on the driver only; fetching runs on
executors.
"""

from __future__ import annotations

import glob
import os
import re
from collections.abc import Callable

_SCHEME_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://")

#: scheme -> bytes fetcher (executor side; pickled into readers)
_FETCHERS: dict[str, Callable[[str], bytes]] = {}
#: scheme -> directory lister (driver side; returns candidate paths)
_LISTERS: dict[str, Callable[[str], list[str]]] = {}


def register_scheme(
    scheme: str,
    fetch: Callable[[str], bytes],
    list_fn: Callable[[str], list[str]] | None = None,
) -> None:
    """Register a custom URI scheme (e.g. an object store) for
    SAME-PROCESS use (driver-side ``from_cnv``-style readers, direct
    :func:`fetch_blob` calls).  ``list_fn(path) -> [paths]`` is
    optional; without it a load of ``scheme://...`` treats the path as
    a single blob.

    For the ``cnv`` DataSource the registry does NOT reach executors
    (the source's whole lifecycle runs in Python workers) — pass
    importable references instead:
    ``.option("fetcher", "my.module:fetch").option("lister",
    "my.module:list_paths")``.
    """
    _FETCHERS[scheme] = fetch
    if list_fn is not None:
        _LISTERS[scheme] = list_fn


def scheme_of(path: str) -> str:
    m = _SCHEME_RE.match(path)
    return m.group(1).lower() if m else ""


def resolve_ref(ref: str) -> Callable:
    """Resolve an importable ``"pkg.mod:attr"`` reference to a callable.

    This is the executor-safe way to hand custom fetchers to a Python
    DataSource: its entire lifecycle (init/partitions/read) runs in
    Python *worker* processes where the driver's in-memory registry
    doesn't exist and instances pickle by class reference — only
    strings survive the options channel, so the callable must be
    importable by name on the workers."""
    mod, _, attr = ref.partition(":")
    if not mod or not attr:
        raise ValueError(f"expected 'module:attr', got {ref!r}")
    import importlib

    obj = importlib.import_module(mod)
    for a in attr.split("."):
        obj = getattr(obj, a)
    return obj


#: default http(s) fetch timeout (seconds) — a hung remote endpoint must
#: fail the task, not stall the executor forever.  Overridable per-call
#: or via the ``http_timeout`` DataSource option.
DEFAULT_HTTP_TIMEOUT = 30.0


def fetch_blob(
    path: str,
    fetcher: Callable[[str], bytes] | None = None,
    http_timeout: float = DEFAULT_HTTP_TIMEOUT,
) -> bytes:
    """Read one blob, local or remote.  ``fetcher``, when given, handles
    any scheme outside the built-ins (local/file/http/https) — pass the
    resolved custom callable when calling from an executor, where the
    driver registry doesn't exist."""
    scheme = scheme_of(path)
    if scheme in ("", "file"):
        local = path[len("file://"):] if scheme == "file" else path
        with open(local, "rb") as f:
            return f.read()
    if scheme in ("http", "https"):
        import urllib.request

        with urllib.request.urlopen(  # noqa: S310 — explicit scheme gate above
            path, timeout=http_timeout
        ) as r:
            return r.read()
    if fetcher is not None:
        return fetcher(path)
    if scheme in _FETCHERS:
        return _FETCHERS[scheme](path)
    raise ValueError(
        f"no fetcher for scheme {scheme!r} ({path}); register one with "
        "python_ctd_spark.io.blobfs.register_scheme (same-process) or "
        "pass an importable 'module:fn' fetcher option to the source, "
        "or use a shared filesystem / binaryFile + from_cnv"
    )


def list_blobs(
    path: str,
    suffix_re: re.Pattern,
    lister: Callable[[str], list[str]] | None = None,
) -> list[str]:
    """Expand a load path into candidate file paths.

    Local directories glob and filter by ``suffix_re``; single files of
    any scheme pass through; custom schemes expand through ``lister``
    (or the same-process registry) and filter the same way.
    """
    scheme = scheme_of(path)
    if scheme in ("", "file"):
        local = path[len("file://"):] if scheme == "file" else path
        if os.path.isdir(local):
            return sorted(
                f
                for f in glob.glob(os.path.join(local, "*"))
                if suffix_re.search(os.path.basename(f))
            )
        return [path]
    if lister is None:
        lister = _LISTERS.get(scheme)
    if lister is not None:
        listed = sorted(
            f for f in lister(path) if suffix_re.search(os.path.basename(f))
        )
        if listed:
            return listed
        # a lister that yields nothing for a path that is itself a
        # qualifying file: treat as a single blob
        return [path] if suffix_re.search(os.path.basename(path)) else []
    return [path]
