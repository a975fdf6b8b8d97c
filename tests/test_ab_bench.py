"""Unit tests for the bench A/B adjudicator's git-side logic (r11
advice: the round-boundary fallback; r11 verdict #4: batch-wall
coverage). Uses a fabricated throwaway git repo so the assertions don't
depend on this repo's round state."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import ab_bench


def _git(repo: Path, *args: str) -> None:
    subprocess.run(
        ["git", "-C", str(repo), *args], check=True, capture_output=True
    )


def _mk_repo(tmp_path: Path) -> Path:
    repo = tmp_path / "repo"
    repo.mkdir()
    _git(repo, "init", "-q")
    _git(repo, "config", "user.email", "t@t")
    _git(repo, "config", "user.name", "t")
    return repo


def test_find_prev_round_skips_untracked_newest(tmp_path):
    """The newest BENCH_rN.json on disk is often the driver's
    still-uncommitted current artifact; the adjudicator must fall back
    to the newest round whose add-commit RESOLVES instead of returning
    None (which silently disabled the guard at round boundaries)."""
    repo = _mk_repo(tmp_path)
    (repo / "BENCH_r01.json").write_text("{}")
    (repo / "BENCH_DETAIL.json").write_text(
        json.dumps({"queries": {"q": 1.0}, "dns_batch_wall": 10.0,
                    "dns_batch_wall_concurrent": 8.0})
    )
    _git(repo, "add", "BENCH_r01.json", "BENCH_DETAIL.json")
    _git(repo, "commit", "-qm", "round 1")
    # untracked newer artifact — the exact round-boundary state
    (repo / "BENCH_r02.json").write_text("{}")

    got = ab_bench.find_prev_round(repo)
    assert got is not None and got[0] == 1
    assert ab_bench.prev_round_timings(repo, got[1]) == {"q": 1.0}


def test_find_prev_round_none_when_nothing_committed(tmp_path):
    repo = _mk_repo(tmp_path)
    (repo / "BENCH_r01.json").write_text("{}")  # untracked only
    assert ab_bench.find_prev_round(repo) is None


def test_adjudicate_batch_walls_rows_and_flagging(tmp_path):
    """Un-flagged walls emit rows (coverage visible) without any
    subprocess re-time; the mover rule uses ratio AND absolute floors."""
    repo = _mk_repo(tmp_path)
    (repo / "BENCH_r01.json").write_text("{}")
    (repo / "BENCH_DETAIL.json").write_text(
        json.dumps({"queries": {}, "dns_batch_wall": 10.0,
                    "dns_batch_wall_concurrent": 8.0})
    )
    _git(repo, "add", "-A")
    _git(repo, "commit", "-qm", "round 1")
    _, commit = ab_bench.find_prev_round(repo)

    rows = ab_bench._adjudicate_batch_walls(
        repo, commit,
        {"dns_batch_wall": 10.5, "dns_batch_wall_concurrent": 8.1},
        "unused-sf-dir",
    )
    assert [r["name"] for r in rows] == [
        "dns_batch_wall", "dns_batch_wall_concurrent",
    ]
    assert all(r["flagged"] is False for r in rows)
    assert all("verdict" not in r for r in rows)  # no re-time ran

    # 1.2x is under the 1.25x mover bar even though the delta is large
    rows = ab_bench._adjudicate_batch_walls(
        repo, commit, {"dns_batch_wall": 12.0}, "unused-sf-dir"
    )
    assert rows[0]["flagged"] is False
    # the concurrent wall was absent from this run: row still emitted
    assert rows[1]["final_bench_s"] is None and rows[1]["flagged"] is False


def test_is_reg_floors():
    assert not ab_bench._is_reg(10.0, 12.0)  # 1.2x < 1.25x bar
    assert ab_bench._is_reg(10.0, 13.0)
    # tiny absolute delta never convicts
    assert not ab_bench._is_reg(0.1, 0.2)

def test_stratified_sample_spread():
    """The catalog sample must span the wall distribution: both tails
    included, only common queries, at most CATALOG_SAMPLE_K names."""
    prev = {f"q{i}": float(i) for i in range(100)}
    cur = {f"q{i}": float(i) * 1.2 for i in range(100)}
    cur["only_cur"] = 5.0
    s = ab_bench.stratified_sample(cur, prev)
    assert len(s) == ab_bench.CATALOG_SAMPLE_K
    assert "q0" in s and "q99" in s  # both tails
    assert "only_cur" not in s
    # evenly spread: consecutive sampled ranks differ by ~len/k
    ranks = sorted(int(n[1:]) for n in s)
    gaps = [b - a for a, b in zip(ranks, ranks[1:])]
    assert max(gaps) <= 2 * (100 // ab_bench.CATALOG_SAMPLE_K)
    # small common sets come back whole
    assert sorted(ab_bench.stratified_sample(
        {"a": 1.0, "b": 2.0}, {"a": 1.0, "b": 2.0}
    )) == ["a", "b"]


def test_adjudicate_catalog_not_flagged(tmp_path):
    """Under the 10% drift bar the totals are recorded and NO re-time
    runs (time_subset would explode on the fake sf dir)."""
    repo = _mk_repo(tmp_path)
    prev = {f"q{i}": 1.0 for i in range(20)}
    cur = {f"q{i}": 1.05 for i in range(20)}  # +5% drift
    out = ab_bench._adjudicate_catalog(
        repo, "deadbeef", cur, prev, "unused-sf-dir"
    )
    assert out["verdict"] == "not_flagged"
    assert out["n_common"] == 20
    assert out["common_total_prev"] == 20.0
    assert out["common_total_cur"] == 21.0
    assert out["drift_ratio"] == 1.05
    assert "sample" not in out


def test_adjudicate_catalog_ambient_and_regression(tmp_path, monkeypatch):
    """Over the bar: the stratified sample re-times on both trees and
    the verdict keys on the SAMPLE ratio — ambient when the code trees
    time alike, regression (after a swapped-order confirm pass) when
    current code is genuinely slower."""
    repo = _mk_repo(tmp_path)
    prev = {f"q{i}": 1.0 + i * 0.1 for i in range(30)}
    cur = {k: v * 1.3 for k, v in prev.items()}  # +30% artifact drift

    monkeypatch.setattr(ab_bench, "ensure_worktree",
                        lambda r, c: Path("/nonexistent-prev-tree"))
    calls: list[tuple] = []

    def fake_time_subset(tree, names, sf_dir, repeat=3):
        calls.append((str(tree), tuple(names)))
        return {n: prev[n] for n in names}  # both trees time at prev

    monkeypatch.setattr(ab_bench, "time_subset", fake_time_subset)
    out = ab_bench._adjudicate_catalog(
        repo, "deadbeef", cur, prev, "sf-dir"
    )
    assert out["verdict"] == "ambient"
    assert out["sample_ratio"] == 1.0
    assert out["drift_ratio"] == 1.3
    assert len(calls) == 2  # one per tree, no confirm pass needed
    assert "confirm_pass" not in out

    # genuinely slower current code: confirm pass runs, then convicts
    calls.clear()

    def slow_cur(tree, names, sf_dir, repeat=3):
        calls.append((str(tree), tuple(names)))
        slow = str(tree) != "/nonexistent-prev-tree"
        return {n: prev[n] * (1.4 if slow else 1.0) for n in names}

    monkeypatch.setattr(ab_bench, "time_subset", slow_cur)
    out = ab_bench._adjudicate_catalog(
        repo, "deadbeef", cur, prev, "sf-dir"
    )
    assert out["verdict"] == "regression"
    assert out["confirm_pass"] is True
    assert len(calls) == 4  # initial pair + swapped-order confirm pair
    assert out["sample_ratio"] == 1.4
