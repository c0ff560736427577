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


def test_committed_clean_protects_prior_round_artifacts(tmp_path):
    # bench.py must never clobber a bench_local_r{N} that is
    # committed-clean in git (a finished round's history) — the
    # round-5 artifact was destroyed this way when the driver skipped
    # committing BENCH_r05.json. Untracked / locally-modified files
    # (this round's in-flight artifact) stay overwritable.
    import subprocess

    from bench import _committed_clean

    repo = str(tmp_path)
    subprocess.run(["git", "init", "-q", repo], check=True)
    subprocess.run(
        ["git", "-C", repo, "-c", "user.email=t@t", "-c", "user.name=t",
         "commit", "-q", "--allow-empty", "-m", "root"],
        check=True,
    )
    f = tmp_path / "bench_local_r05.json"
    assert not _committed_clean(repo, "bench_local_r05.json")  # missing
    f.write_text("{}")
    assert not _committed_clean(repo, "bench_local_r05.json")  # untracked
    subprocess.run(["git", "-C", repo, "add", "bench_local_r05.json"], check=True)
    subprocess.run(
        ["git", "-C", repo, "-c", "user.email=t@t", "-c", "user.name=t",
         "commit", "-q", "-m", "r05"],
        check=True,
    )
    assert _committed_clean(repo, "bench_local_r05.json")  # prior round
    f.write_text('{"v": 1}')
    assert not _committed_clean(repo, "bench_local_r05.json")  # dirty again
