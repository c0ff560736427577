"""bench_compare: baseline recovery + regression thresholds (no Spark)."""

import json

from bench_compare import compare, load_timings


def test_load_from_bench_line(tmp_path):
    p = tmp_path / "cur.json"
    p.write_text(json.dumps({"metric": "m", "value": 2.0, "queries": {"q01_a": 1.0, "q02_b": 1.0}}))
    assert load_timings(str(p)) == {"q01_a": 1.0, "q02_b": 1.0}


def test_load_from_driver_tail_artifact(tmp_path):
    # Driver artifacts keep only the truncated stdout tail; timings are
    # recovered by regex scan over it.
    p = tmp_path / "r.json"
    p.write_text(json.dumps({"n": 1, "parsed": None, "tail": '.44, "q35_x": 1.5, "q36_y": -1.0}'}))
    assert load_timings(str(p)) == {"q35_x": 1.5, "q36_y": -1.0}


def test_compare_flags_only_material_regressions():
    base = {"q1": 4.0, "q2": 0.3, "q3": 2.0, "q4": -1.0, "q5": 5.0}
    cur = {"q1": 8.0, "q2": 0.6, "q3": 2.1, "q4": 1.0, "q5": 2.0, "q6": 1.0, "q7": -1.0}
    rep = compare(base, cur)
    assert set(rep["regressions"]) == {"q1"}  # q2 doubles but is sub-second noise
    assert set(rep["improvements"]) == {"q5"}
    assert rep["errors"] == ["q7"]  # current-run failure always surfaces
    # q4 (baseline was an error) and q6 (new) are not regressions
    assert "q4" not in rep["regressions"] and "q6" not in rep["regressions"]


def test_next_free_slot_never_reuses_an_existing_record(tmp_path):
    # bench.py must never clobber ANY existing bench_local_r{N} —
    # committed ones are a finished round's history (round-5's was
    # destroyed by round-number aliasing), and untracked ones are the
    # only copy of a finished ~35-min run (round 11 nearly lost one
    # when a relaunch reused its uncommitted slot).
    from bench import _next_free_slot

    repo = str(tmp_path)
    assert _next_free_slot(repo, 5) == 5  # empty dir: first choice wins
    (tmp_path / "bench_local_r05.json").write_text("{}")
    assert _next_free_slot(repo, 5) == 6  # untracked still protected
    (tmp_path / "bench_local_r06.json").write_text("{}")
    assert _next_free_slot(repo, 5) == 7  # skips a contiguous run
    assert _next_free_slot(repo, 2) == 2  # gaps below stay usable


def test_geomean_and_tail_summary():
    from bench_compare import compare

    base = {"q1": 1.0, "q2": 2.0, "q3": 4.0, "q7": -1.0}
    cur = {"q1": 2.0, "q2": 1.0, "q3": 6.0, "q4": 9.0, "q7": 1.0}
    rep = compare(base, cur)
    # shared positive pairs: q1 2x, q2 0.5x, q3 1.5x -> geomean 1.1447
    assert rep["geomean"] == 1.1447
    # >5s tail lists current-run values only, slowest first
    assert [t["query"] for t in rep["tail_over_5s"]] == ["q4", "q3"]
    # all-new current run: no shared pairs -> geomean None, not a crash
    assert compare({}, {"q9": 1.0})["geomean"] is None
