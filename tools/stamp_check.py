"""Stamp hygiene for the driver-correctness registry (VERDICT r6 item 6).

The driver stamps only the FIRST 50 registry entries per round, so a
query whose implementing code changes after its last stamp silently
holds a stale green.  This tool makes that class of drift mechanical:

- every registry query gets a content FINGERPRINT — sha256 over its
  ``queries()`` callable source, its ``oracle_sql()`` string, and the
  bytes of every ``python_ctd_spark`` module it (transitively) imports;
- ``STAMPS.json`` records, per query, the latest driver-stamp round and
  the fingerprint of the tree that earned it;
- ``check`` prints queries whose CURRENT fingerprint differs from the
  stamped one (code newer than stamp) and verifies the registry window:
  every stale/new query must sit in the first 50 entries (or carry an
  explicit ``waived`` note for behavior-preserving refactors verified
  by the full local parity suite, tests/test_oracle_parity.py);
- ``check`` ALSO enforces a maximum audit age (VERDICT r11 item 1 —
  the claim "no stamp older than rN" must be a checked gate, not
  prose): any query whose latest driver stamp is older than
  ``current_round - 3`` must sit inside the window so the coming
  driver run refreshes it; an aged row OUTSIDE the window fails the
  check.  ``current_round`` defaults to ``max(stamp rounds) + 1``
  (the round whose driver run the window feeds) and can be pinned
  with ``check --round N``.  A waiver does NOT excuse age — waivers
  attest behavior-preserving code drift against the local parity
  suite; age is about the freshness of the DRIVER's independent
  evidence, which only a re-audit restores;
- ``check`` ALSO fails when the registration count makes the age floor
  unsatisfiable (VERDICT r12 item 2): the registry is capped at
  ``WINDOW * MAX_STAMP_AGE`` rows, and an earliest-deadline-first
  projection over the current stamps proves the coming rounds can (or
  cannot) re-audit every row before its floor expires;
- ``stamp --round N name...`` records current fingerprints after a
  round's driver run (``--window`` stamps the current first 50).

- ``order`` emits the registry window ordering MECHANICALLY (VERDICT r7
  item 2) — no hand-maintained ordering comment: AGED queries first
  (stamp older than ``current_round - 3`` — they must be re-audited
  this round and must never be evicted by late-round registrations,
  the exact r11 failure mode where 9 unplanned new rows pushed the r6
  debt out of the window), then queries needing fresh driver evidence
  (no stamp, then stale-fingerprint by stamp round), then everything
  else stalest-stamp-first (waived drifts ahead of clean rows of the
  same round, alphabetical within a tier).
  ``order --write`` persists the list to ``WINDOW_ORDER.json``, which
  ``__spark_entry__.queries()`` consumes as its registry order; the
  round-trip (generated order == live registry order) is test-pinned in
  tests/test_stamp_check.py.

Usage:
    python tools/stamp_check.py check
    python tools/stamp_check.py order [--write]
    python tools/stamp_check.py stamp --round 7 --window
    python tools/stamp_check.py stamp --round 7 name1 name2 ...
    python tools/stamp_check.py waive name "reason"
"""

from __future__ import annotations

import argparse
import ast
import hashlib
import inspect
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG_ROOT = os.path.join(REPO, "python_ctd_spark")
STAMPS_PATH = os.path.join(REPO, "STAMPS.json")
WINDOW = 50

sys.path.insert(0, REPO)

_MOD_RE = re.compile(r"\bpython_ctd_spark(?:\.[A-Za-z_][\w.]*)?")


def _module_file(mod: str) -> str | None:
    """``python_ctd_spark.operators.text`` -> its source path (or the
    package __init__)."""
    rel = mod.split(".")
    p = os.path.join(REPO, *rel)
    if os.path.isfile(p + ".py"):
        return p + ".py"
    if os.path.isdir(p):
        return os.path.join(p, "__init__.py")
    # trailing attribute (from python_ctd_spark.operators.text import X
    # regex-matched as ...text.X): drop components until a file resolves
    while len(rel) > 1:
        rel = rel[:-1]
        p = os.path.join(REPO, *rel)
        if os.path.isfile(p + ".py"):
            return p + ".py"
        if os.path.isdir(p):
            return os.path.join(p, "__init__.py")
    return None


def _imports_of_file(path: str) -> set[str]:
    """python_ctd_spark module names imported by a module file
    (absolute + relative forms), via ast."""
    with open(path, encoding="utf-8") as f:
        src = f.read()
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return set()
    pkg_parts = os.path.relpath(path, REPO).replace(os.sep, ".")
    pkg_parts = pkg_parts[: -len(".py")] if pkg_parts.endswith(".py") else pkg_parts
    if pkg_parts.endswith(".__init__"):
        pkg_parts = pkg_parts[: -len(".__init__")]
    parent = pkg_parts.rsplit(".", 1)[0] if "." in pkg_parts else ""
    mods: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.name.startswith("python_ctd_spark"):
                    mods.add(a.name)
        elif isinstance(node, ast.ImportFrom):
            if node.level:  # relative: resolve against this file's package
                base = parent.split(".")
                # level=1 -> current package, each extra level pops one
                base = base[: len(base) - (node.level - 1)]
                stem = ".".join(base + ([node.module] if node.module else []))
                if stem.startswith("python_ctd_spark"):
                    mods.add(stem)
                    for a in node.names:
                        mods.add(f"{stem}.{a.name}")
            elif node.module and node.module.startswith("python_ctd_spark"):
                mods.add(node.module)
                for a in node.names:
                    mods.add(f"{node.module}.{a.name}")
    return mods


def _closure_files(seed_mods: set[str]) -> list[str]:
    """Transitive closure of module files reachable from seed modules."""
    seen_files: set[str] = set()
    frontier = {f for m in seed_mods if (f := _module_file(m))}
    while frontier:
        f = frontier.pop()
        if f in seen_files:
            continue
        seen_files.add(f)
        for m in _imports_of_file(f):
            nf = _module_file(m)
            if nf and nf not in seen_files:
                frontier.add(nf)
    return sorted(seen_files)


_IDENT_RE = re.compile(r"\b_[A-Za-z0-9_]+\b")


def _entry_closure(src: str, entry, _seen: set[str] | None = None) -> str:
    """Concatenated sources/reprs of the __spark_entry__ module-level
    helpers a query's source references (``_t``, ``_ev``, SQL-builder
    functions, ``_NEARDUP_PLANES``-style constants), transitively.

    Without this, editing a shared driver helper changes every query's
    behavior while no fingerprint moves — exactly the stale-green drift
    this tool exists to catch.  Hashing all of __spark_entry__.py
    instead would be too blunt: every registry rotation would stale
    every stamp."""
    seen = _seen if _seen is not None else set()
    parts: list[str] = []
    for name in sorted(set(_IDENT_RE.findall(src))):
        if name in seen:
            continue
        seen.add(name)
        obj = getattr(entry, name, None)
        if obj is None:
            continue
        if inspect.isfunction(obj) and (
            obj.__module__ == entry.__name__
            # r9 registry split: helpers/callables re-imported from
            # tools.registry.* / tools.oracles.* are still entry-module
            # state for fingerprint purposes — their SOURCE TEXT is what
            # the hash covers, and the split moved it verbatim, so
            # following them here keeps fingerprints byte-stable across
            # the refactor (the point of VERDICT r8 item 9's "fingerprints
            # must survive" constraint)
            or (obj.__module__ or "").startswith("tools.")
        ):
            try:
                fsrc = inspect.getsource(obj)
            except OSError:
                continue
            parts.append(fsrc)
            parts.append(_entry_closure(fsrc, entry, seen))
        elif isinstance(obj, (int, float, str, bool, tuple)):
            # IMMUTABLE constants only.  Lists/dicts at module level are
            # runtime state (_STREAM_RUN_COUNTER, _STREAM_STAGE_CACHE)
            # whose repr changes as queries execute — hashing them made
            # fingerprints drift mid-suite.  A mutable "config" constant
            # is still covered indirectly: its consumers' sources are
            # hashed, and config belongs in tuples/scalars anyway.
            parts.append(f"{name}={obj!r}")
    return "\n".join(parts)


_FILE_DIGESTS: dict[str, bytes] = {}
_CLOSURE_CACHE: dict[frozenset, list[str]] = {}


def _file_digest(path: str) -> bytes:
    d = _FILE_DIGESTS.get(path)
    if d is None:
        with open(path, "rb") as f:
            d = _FILE_DIGESTS[path] = hashlib.sha256(f.read()).digest()
    return d


def fingerprints() -> dict[str, str]:
    """name -> sha256 fingerprint for every registry query, computed
    from the CURRENT tree: callable source + entry-module helper
    closure + oracle SQL + every (transitively) imported
    python_ctd_spark module file."""
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    out: dict[str, str] = {}
    for name, fn in qs.items():
        h = hashlib.sha256()
        src = inspect.getsource(fn)
        closure_txt = _entry_closure(src, entry)
        h.update(src.encode())
        h.update(closure_txt.encode())
        h.update(oracles.get(name, "").encode())
        # scan the helper-closure text too: a package module imported
        # only inside a shared __spark_entry__ helper must still
        # contribute its file bytes to the fingerprint
        mods = frozenset(_MOD_RE.findall(src) + _MOD_RE.findall(closure_txt))
        closure = _CLOSURE_CACHE.get(mods)
        if closure is None:
            closure = _CLOSURE_CACHE[mods] = _closure_files(set(mods))
        for path in closure:
            h.update(_file_digest(path))
        out[name] = h.hexdigest()
    return out


def _load() -> dict:
    if os.path.exists(STAMPS_PATH):
        with open(STAMPS_PATH, encoding="utf-8") as f:
            return json.load(f)
    return {}


def _save(stamps: dict) -> None:
    with open(STAMPS_PATH, "w", encoding="utf-8") as f:
        json.dump(stamps, f, indent=1, sort_keys=True)
        f.write("\n")


#: maximum rounds a driver stamp may age before the row MUST re-enter
#: the audit window (stamp < current_round - MAX_STAMP_AGE fails the
#: check unless the row is in-window for the coming run)
MAX_STAMP_AGE = 3


def _current_round(stamps: dict) -> int:
    """The round whose driver run the current window feeds: one past
    the newest stamp on record (``check --round`` overrides)."""
    return max((rec["round"] for rec in stamps.values()), default=0) + 1


def projection_violations(names: list[str], stamps: dict,
                          current: int) -> list[str]:
    """Audit-bandwidth forward projection (VERDICT r12 item 2).

    The driver audits at most WINDOW rows per round and the age gate
    demands a stamp no older than ``current - MAX_STAMP_AGE``, so the
    registry has a hard capacity ceiling of ``WINDOW * MAX_STAMP_AGE``
    rows — beyond it, SOME row's floor is unsatisfiable no matter how
    the windows are packed.  Below the ceiling, the current stamp
    distribution can still be infeasible (too many rows sharing one
    deadline), so we also run an earliest-deadline-first schedule
    check: a row stamped at round r drops below the floor at round
    ``r + MAX_STAMP_AGE + 1`` — legal only if it sits in THAT round's
    window, where the driver refreshes it, so that round is its audit
    deadline; never-stamped rows are due THIS round.  EDF is optimal for
    unit jobs with deadlines, so "cumulative rows due by round d
    exceeds the window slots available in rounds current..d" is a
    proof of infeasibility, not a heuristic warning."""
    msgs: list[str] = []
    ceiling = WINDOW * MAX_STAMP_AGE
    if len(names) > ceiling:
        msgs.append(
            f"registry has {len(names)} rows > audit-bandwidth ceiling "
            f"{ceiling} (= {WINDOW}-slot window x {MAX_STAMP_AGE}-round "
            f"max age): the age floor is unsatisfiable for at least "
            f"{len(names) - ceiling} row(s) — extend existing rows "
            f"instead of registering new ones")
    deadlines = sorted(
        current if (rec := stamps.get(n)) is None
        else max(current, rec["round"] + MAX_STAMP_AGE + 1)
        for n in names
    )
    for i, d in enumerate(deadlines):
        capacity = (d - current + 1) * WINDOW
        if i + 1 > capacity:
            msgs.append(
                f"audit schedule infeasible: {i + 1} rows due for "
                f"re-audit by r{d} but only {capacity} window slots "
                f"exist in r{current}..r{d}")
            break
    return msgs


def cmd_check(round_no: int | None = None) -> int:
    import __spark_entry__ as entry

    names = list(entry.queries())
    window = set(names[:WINDOW])
    stamps = _load()
    cur = fingerprints()
    current = round_no if round_no is not None else _current_round(stamps)
    age_floor = current - MAX_STAMP_AGE
    stale, fresh_missing, aged = [], [], []
    for n in names:
        rec = stamps.get(n)
        if rec is None:
            fresh_missing.append(n)
            continue
        if rec.get("fingerprint") != cur[n]:
            # a waiver excuses exactly ONE tree: the fingerprint it was
            # granted for.  Any further drift re-flags the query, so a
            # behavior-preserving waiver can never mask a later real
            # regression.
            if rec.get("waived") and rec.get("waived_fingerprint") == cur[n]:
                print(f"WAIVED  {n} (stamp r{rec['round']}): {rec['waived']}")
            else:
                stale.append(n)
        # age is orthogonal to drift: a byte-identical (or waived) row
        # whose driver evidence is too old still needs a re-audit
        if rec["round"] < age_floor:
            aged.append(n)
    ok = True
    for n in stale:
        where = "IN window" if n in window else "NOT in window"
        print(f"STALE   {n} (stamp r{stamps[n]['round']}) — {where}")
        if n not in window:
            ok = False
    for n in fresh_missing:
        where = "IN window" if n in window else "NOT in window"
        print(f"NOSTAMP {n} — {where}")
        if n not in window:
            ok = False
    for n in aged:
        where = "IN window" if n in window else "NOT in window"
        print(f"AGED    {n} (stamp r{stamps[n]['round']} <"
              f" r{age_floor}) — {where}")
        if n not in window:
            ok = False
    for msg in projection_violations(names, stamps, current):
        print(f"PROJECTION {msg}")
        ok = False
    if not stale and not fresh_missing and not aged:
        print("all stamps current")
    print((f"window OK (current round r{current}, age floor r{age_floor})"
           if ok else
           "window VIOLATION: stale/new/aged queries outside the first "
           "%d entries (current round r%d, age floor r%d)"
           % (WINDOW, current, age_floor)))
    return 0 if ok else 1


ORDER_PATH = os.path.join(REPO, "WINDOW_ORDER.json")


def compute_order() -> list[str]:
    """The mechanical registry ordering (stalest-stamp-first,
    changed-files-first).  Four tiers:

    0. AGED: stamp older than ``current_round - MAX_STAMP_AGE`` — these
       MUST be re-audited this round (cmd_check fails otherwise), so
       they lead the window where late-round registrations can never
       evict them (the r11 failure mode), stalest stamp first;
    1. no stamp at all (new queries — the driver has never seen them);
    2. stale fingerprint, not validly waived (code changed since the
       stamp — the green is no longer evidence), stalest stamp first;
    3. everything else, stalest stamp first; within a round, waived
       drifts (behavior-preserving refactors excused against the full
       local parity suite) ahead of byte-identical rows, because their
       driver evidence describes an older tree.

    Alphabetical within every tier, so the order is a pure function of
    (registry contents, STAMPS.json, tree bytes).
    """
    import __spark_entry__ as entry

    names = list(entry.queries())
    stamps = _load()
    cur = fingerprints()
    age_floor = _current_round(stamps) - MAX_STAMP_AGE

    def key(n: str):
        rec = stamps.get(n)
        if rec is None:
            return (1, -1, 0, n)
        if rec["round"] < age_floor:
            return (0, rec["round"], 0, n)
        drifted = rec.get("fingerprint") != cur[n]
        waived_ok = bool(rec.get("waived")) and rec.get("waived_fingerprint") == cur[n]
        if drifted and not waived_ok:
            return (2, rec["round"], 0, n)
        return (3, rec["round"], 0 if (drifted and waived_ok) else 1, n)

    return sorted(names, key=key)


def cmd_order(write: bool) -> int:
    order = compute_order()
    if write:
        with open(ORDER_PATH, "w", encoding="utf-8") as f:
            json.dump(order, f, indent=0)
            f.write("\n")
        print(f"wrote {len(order)} names to {os.path.basename(ORDER_PATH)}")
    else:
        for n in order:
            print(n)
    return 0


def cmd_stamp(round_no: int, names: list[str], use_window: bool) -> int:
    import __spark_entry__ as entry

    all_names = list(entry.queries())
    if use_window:
        names = all_names[:WINDOW]
    unknown = [n for n in names if n not in all_names]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 1
    stamps = _load()
    cur = fingerprints()
    for n in names:
        stamps[n] = {"round": round_no, "fingerprint": cur[n]}
    _save(stamps)
    print(f"stamped {len(names)} queries at round {round_no}")
    return 0


def cmd_waive(name: str, reason: str) -> int:
    stamps = _load()
    if name not in stamps:
        print(f"no stamp for {name}")
        return 1
    stamps[name]["waived"] = reason
    # pin the waiver to the exact tree it excuses
    stamps[name]["waived_fingerprint"] = fingerprints()[name]
    _save(stamps)
    print(f"waived {name}: {reason}")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    cp = sub.add_parser("check")
    cp.add_argument("--round", type=int, default=None,
                    help="pin the current round (default: newest stamp + 1)")
    op = sub.add_parser("order")
    op.add_argument("--write", action="store_true")
    sp = sub.add_parser("stamp")
    sp.add_argument("--round", type=int, required=True)
    sp.add_argument("--window", action="store_true")
    sp.add_argument("names", nargs="*")
    wp = sub.add_parser("waive")
    wp.add_argument("name")
    wp.add_argument("reason")
    args = ap.parse_args()
    if args.cmd == "check":
        return cmd_check(args.round)
    if args.cmd == "order":
        return cmd_order(args.write)
    if args.cmd == "stamp":
        return cmd_stamp(args.round, args.names, args.window)
    return cmd_waive(args.name, args.reason)


if __name__ == "__main__":
    sys.exit(main())
