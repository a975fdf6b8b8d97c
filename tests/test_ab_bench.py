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
