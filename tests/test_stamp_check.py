"""Stamp-hygiene tool contract (tools/stamp_check.py): fingerprints
must cover the registry, move when implementing code moves, and the
window check must flag stale/new queries outside the first 50."""

import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def sc():
    spec = importlib.util.spec_from_file_location(
        "stamp_check", os.path.join(REPO, "tools", "stamp_check.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def fps(sc):
    return sc.fingerprints()


def test_fingerprints_cover_registry(sc, fps):
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    names = list(entry.queries())
    assert set(fps) == set(names)
    # sha256 hex, all distinct would be too strong (twins share modules
    # but never their callable source) — they must at least be valid
    # and non-identical across a sample of unrelated queries
    assert all(len(v) == 64 for v in fps.values())
    assert fps["despike"] != fps["q1_pricing_summary"]


def test_fingerprint_moves_with_oracle_sql(sc, monkeypatch):
    """Fingerprint includes the oracle SQL: perturbing it must change
    the hash (so oracle edits can never hide behind an old stamp)."""
    import __spark_entry__ as entry

    base = sc.fingerprints()["q1_pricing_summary"]
    orig = entry.oracle_sql

    def patched():
        d = dict(orig())
        d["q1_pricing_summary"] = d["q1_pricing_summary"] + " -- perturbed"
        return d

    monkeypatch.setattr(entry, "oracle_sql", patched)
    assert sc.fingerprints()["q1_pricing_summary"] != base


def test_module_closure_reaches_operator_files(sc):
    """A query importing an operator module must fingerprint that file
    (and its transitive package imports), so refactors there go stale."""
    files = sc._closure_files({"python_ctd_spark.operators.similarity"})
    names = {os.path.basename(f) for f in files}
    assert "similarity.py" in names
    # similarity imports sampling (hash_uniform) transitively
    assert "sampling.py" in names


def test_check_flags_stale_outside_window(sc, fps, monkeypatch, tmp_path, capsys):
    """A query whose fingerprint moved after its stamp and which is NOT
    in the first-50 window must fail the check; a waiver downgrades it
    to informational."""
    import __spark_entry__ as entry

    names = list(entry.queries())
    tail_q = names[-1]  # guaranteed outside the window
    stamps = {n: {"round": 7, "fingerprint": fps[n]} for n in names}
    stamps[tail_q] = {"round": 6, "fingerprint": "0" * 64}
    p = tmp_path / "STAMPS.json"
    p.write_text(json.dumps(stamps))
    monkeypatch.setattr(sc, "STAMPS_PATH", str(p))
    assert sc.cmd_check() == 1
    out = capsys.readouterr().out
    assert f"STALE   {tail_q}" in out and "VIOLATION" in out

    # a waiver without the pinned fingerprint does NOT excuse the drift
    stamps[tail_q]["waived"] = "behavior-preserving, parity-verified"
    p.write_text(json.dumps(stamps))
    assert sc.cmd_check() == 1
    assert "STALE" in capsys.readouterr().out

    # pinned to the CURRENT fingerprint -> informational
    stamps[tail_q]["waived_fingerprint"] = fps[tail_q]
    p.write_text(json.dumps(stamps))
    assert sc.cmd_check() == 0
    assert "WAIVED" in capsys.readouterr().out

    # further drift after the waiver re-flags it
    stamps[tail_q]["waived_fingerprint"] = "f" * 64
    p.write_text(json.dumps(stamps))
    assert sc.cmd_check() == 1
    assert "STALE" in capsys.readouterr().out


def test_repo_stamps_window_is_clean(sc):
    """The committed STAMPS.json must satisfy the window invariant on
    the current tree — this is the executable form of the registry's
    ordering comment."""
    assert sc.cmd_check() == 0


def test_entry_helper_closure_reaches_shared_helpers(sc):
    """Fingerprints must cover __spark_entry__ module-level helpers a
    query references (shared loaders, SQL builders, config constants) —
    editing `_t` or `_NEARDUP_PLANES` changes query behavior and must
    move the hash."""
    import __spark_entry__ as entry

    closure = sc._entry_closure("return _t(spark, sf_dir, 'events')", entry)
    assert "def _t(" in closure
    # the r9 registry split moved _t to tools/registry/base.py — the
    # closure must keep following helpers RE-IMPORTED from tools.*
    # (their source text is what the hash covers), or every moved
    # helper would silently drop out of every fingerprint
    import tools.registry.base as _base

    assert entry._t is _base._t and entry._t.__module__ == "tools.registry.base"
    closure = sc._entry_closure("x = _NEARDUP_PLANES", entry)
    assert "_NEARDUP_PLANES=6" in closure
    # transitive: a helper that itself calls another helper pulls both
    # (both now live in tools.oracles.ann — cross-module transitivity)
    closure = sc._entry_closure("_ann_index_probe_sql()", entry)
    assert "def _lsh_ann_sql(" in closure


def test_order_roundtrip_pins_registry(sc):
    """VERDICT r7 item 2: the live registry order IS the mechanically
    generated one — `stamp_check.py order` output == list(queries()) ==
    the committed WINDOW_ORDER.json.  Regenerate with
    `python tools/stamp_check.py order --write` after any edit."""
    import __spark_entry__ as entry

    generated = sc.compute_order()
    assert list(entry.queries()) == generated
    with open(os.path.join(REPO, "WINDOW_ORDER.json"), encoding="utf-8") as f:
        committed = json.load(f)
    assert committed == generated


def test_order_tiers(sc, fps, monkeypatch, tmp_path):
    """Ordering tiers: no-stamp first, then unwaived-stale by stamp
    round, then stalest-round-first with waived drifts ahead of clean
    rows of the same round."""
    import __spark_entry__ as entry

    names = list(entry.queries())
    a, b, c, d, e = names[:5]
    stamps = {n: {"round": 7, "fingerprint": fps[n]} for n in names}
    del stamps[a]                                    # tier 0: never stamped
    stamps[b] = {"round": 6, "fingerprint": "0" * 64}  # tier 1: stale r6
    stamps[c] = {"round": 5, "fingerprint": fps[c]}    # tier 2: clean r5
    stamps[d] = {                                       # tier 2: waived r6
        "round": 6, "fingerprint": "0" * 64,
        "waived": "x", "waived_fingerprint": fps[d],
    }
    stamps[e] = {"round": 6, "fingerprint": fps[e]}    # tier 2: clean r6
    p = tmp_path / "STAMPS.json"
    p.write_text(json.dumps(stamps))
    monkeypatch.setattr(sc, "STAMPS_PATH", str(p))
    order = sc.compute_order()
    assert order[0] == a and order[1] == b and order[2] == c
    # waived r6 sorts before clean r6
    assert order.index(d) < order.index(e)
    # everything else (clean r7) after all of the above
    assert max(order.index(x) for x in (a, b, c, d, e)) < min(
        order.index(n) for n in names if n not in (a, b, c, d, e)
    )


def test_max_stamp_age_gate(sc, fps, monkeypatch, tmp_path, capsys):
    """VERDICT r11 item 1: a row whose driver stamp is older than
    current_round - 3 must sit in the window (so the coming run
    refreshes it) — outside the window it FAILS the check, and a
    waiver does not excuse age (waivers attest code drift, not
    evidence freshness).  The `order` tiering puts aged rows FIRST,
    ahead of never-stamped registrations, so late-round additions can
    never evict them."""
    import __spark_entry__ as entry

    names = list(entry.queries())
    tail_q = names[-1]  # outside the 50-row window
    head_q = names[0]
    stamps = {n: {"round": 11, "fingerprint": fps[n]} for n in names}
    stamps[tail_q] = {"round": 8, "fingerprint": fps[tail_q]}  # aged, clean
    p = tmp_path / "STAMPS.json"
    p.write_text(json.dumps(stamps))
    monkeypatch.setattr(sc, "STAMPS_PATH", str(p))
    # current round inferred as max(11)+1 = 12 -> floor r9 -> r8 fails
    assert sc.cmd_check() == 1
    out = capsys.readouterr().out
    assert f"AGED    {tail_q} (stamp r8 < r9) — NOT in window" in out

    # a waiver pinned to the current tree does NOT excuse age
    stamps[tail_q]["waived"] = "behavior-preserving"
    stamps[tail_q]["waived_fingerprint"] = fps[tail_q]
    p.write_text(json.dumps(stamps))
    assert sc.cmd_check() == 1
    assert "AGED" in capsys.readouterr().out

    # pinning the round relaxes/tightens the floor explicitly
    assert sc.cmd_check(round_no=11) == 0   # floor r8: r8 is fresh enough
    capsys.readouterr()

    # an aged row IN the window passes (the driver will refresh it)
    stamps[head_q] = {"round": 8, "fingerprint": fps[head_q]}
    stamps[tail_q] = {"round": 11, "fingerprint": fps[tail_q]}
    p.write_text(json.dumps(stamps))
    assert sc.cmd_check() == 0
    assert f"AGED    {head_q} (stamp r8 < r9) — IN window" in capsys.readouterr().out

    # ordering: aged rows lead, BEFORE never-stamped registrations
    del stamps[tail_q]  # tier: no stamp
    p.write_text(json.dumps(stamps))
    order = sc.compute_order()
    assert order[0] == head_q and order[1] == tail_q


def test_projection_gate(sc, fps, monkeypatch, tmp_path, capsys):
    """VERDICT r12 item 2: the check must FAIL any tree whose
    registration count (or stamp distribution) makes the max-age floor
    unsatisfiable, instead of discovering it one round too late."""
    names = [f"q{i:03d}" for i in range(10)]
    window, age = sc.WINDOW, sc.MAX_STAMP_AGE
    monkeypatch.setattr(sc, "WINDOW", 3)
    monkeypatch.setattr(sc, "MAX_STAMP_AGE", 2)
    try:
        # 10 rows > 3*2 ceiling: unsatisfiable regardless of stamps
        msgs = sc.projection_violations(
            names, {n: {"round": 5} for n in names}, 6)
        assert any("ceiling 6" in m for m in msgs)

        # under the ceiling but infeasible: 5 rows all due THIS round
        # (never stamped) with a 3-slot window
        msgs = sc.projection_violations(names[:5], {}, 6)
        assert any("infeasible" in m and "by r6" in m for m in msgs)

        # feasible: 6 rows, deadlines staggered 3-per-round
        stamps = {n: {"round": 4 + i // 3} for i, n in enumerate(names[:6])}
        assert sc.projection_violations(names[:6], stamps, 6) == []

        # a past-due stamp clamps to the CURRENT round, not the past
        msgs = sc.projection_violations(
            names[:4], {n: {"round": 0} for n in names[:4]}, 6)
        assert any("by r6" in m for m in msgs)
    finally:
        monkeypatch.setattr(sc, "WINDOW", window)
        monkeypatch.setattr(sc, "MAX_STAMP_AGE", age)

    # the REAL repo must pass the projection gate today
    real = sc.projection_violations(
        list(fps), sc._load(), sc._current_round(sc._load()))
    assert real == [], real

    # and cmd_check wires it in: an over-ceiling registry fails even
    # with fresh stamps everywhere
    import __spark_entry__ as entry
    all_names = list(entry.queries())
    p = tmp_path / "STAMPS.json"
    p.write_text(json.dumps(
        {n: {"round": 12, "fingerprint": fps[n]} for n in all_names}))
    monkeypatch.setattr(sc, "STAMPS_PATH", str(p))
    monkeypatch.setattr(sc, "MAX_STAMP_AGE", 0)  # ceiling 0 — must trip
    assert sc.cmd_check(round_no=12) == 1
    assert "PROJECTION" in capsys.readouterr().out


def test_plan_census_regression_rules():
    """tools/plan_census.py (new r11): the shape-regression rules fire
    on new cartesians/NLJs, exchange growth, and the lost-broadcast
    pattern — and stay quiet on improvements and benign churn."""
    import tools.plan_census as pc

    base = {"exchange": 2, "bhj": 1, "smj": 0, "nlj": 1, "cartesian": 0,
            "sort": 1, "window": 0, "shj": 0, "map_in_pandas": 0,
            "py_eval": 0, "grouped_map": 0}
    stored = {"q": dict(base)}
    # improvement: fewer exchanges — changed, not regressed
    regs, changed = pc.compare(stored, {"q": dict(base, exchange=1)})
    assert not regs and len(changed) == 1
    # regression: extra exchange
    regs, _ = pc.compare(stored, {"q": dict(base, exchange=3)})
    assert any("exchanges 2 -> 3" in r for r in regs)
    # regression: lost broadcast (smj up AND bhj down)
    regs, _ = pc.compare(stored, {"q": dict(base, smj=1, bhj=0)})
    assert any("degraded" in r for r in regs)
    # benign: smj up because a NEW join appeared with bhj intact
    regs, _ = pc.compare(stored, {"q": dict(base, smj=1)})
    assert not regs
    # regression: new nested loop / cartesian
    regs, _ = pc.compare(stored, {"q": dict(base, nlj=2)})
    assert any("NestedLoop" in r for r in regs)
    regs, _ = pc.compare(stored, {"q": dict(base, cartesian=1)})
    assert any("Cartesian" in r for r in regs)
    # new/removed queries are reported by main(), not compare(): absent
    # names simply don't participate
    regs, changed = pc.compare(stored, {"other": dict(base)})
    assert not regs and not changed
    # the committed census has no cartesians anywhere
    import json
    import os

    with open(os.path.join(pc.REPO, "PLAN_CENSUS.json")) as f:
        census = json.load(f)
    assert len(census) >= 138
    assert all(v["cartesian"] == 0 for v in census.values())
