"""Automated bench A/B adjudication (round-10 verdict, next-round #1).

Two rounds in a row the driver's per-round BENCH artifact shipped
phantom movers — queries reading 1.3-1.9x their prior-round minimums
under ambient VM load, with zero code delta — and only a MANUAL re-time
of the flagged queries on the previous round's code cleared them. This
tool makes that adjudication part of the bench protocol itself:

1. flag: any query common to this bench run and the previous round's
   committed bench detail whose current min exceeds ``FLAG_RATIO``
   (1.25x) of the previous round's min, with absolute floors so micro
   queries don't flag on scheduler jitter;
2. re-time: the flagged set runs again on BOTH code versions — the
   current tree and a detached git worktree of the previous round's
   final code (the commit that added ``BENCH_r{N-1}.json`` — the
   driver's round-boundary commit) — each in its own fresh subprocess
   via that tree's own ``tools/time_queries.py``, back to back in the
   same box session so both sides share the same weather;
3. verdict: ``"regression"`` when current code still exceeds
   ``FLAG_RATIO`` x previous code (and the delta clears the floor),
   ``"ambient"`` when the side-by-side re-time shows the two code
   versions within noise of each other (the artifact's mover was the
   VM, not the engine).

``bench.py`` calls :func:`adjudicate` after its passes and embeds the
row list ``{query, prev_round_s, final_bench_s, prev_code_s,
cur_code_s, ratio, verdict}`` as the ``ab`` section of the bench line
(full copy in BENCH_DETAIL.json). Any git/subprocess failure degrades
to ``verdict: "unadjudicated"`` rows — the bench must never crash on
the adjudicator's account.

The ``ab.catalog`` subsection (r12 verdict #1) adjudicates the
HEADLINE total the same way: the common-query totals of both rounds
are always recorded, and when the current total drifts more than
``CATALOG_DRIFT_RATIO`` a stratified ~10-query sample — spread across
the wall distribution, not just the flagged movers, because uniform
ambient drift lives in the sub-floor mass — re-times on both trees
back to back and the verdict keys on the sample's total ratio.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
from pathlib import Path

FLAG_RATIO = 1.25
# floors: previous min must be big enough that a ratio is meaningful,
# and the absolute delta must exceed the documented cross-round jitter
# for sub-2s queries (bench.py notes: +-0.3-0.8s from pass-order heat)
FLAG_PREV_FLOOR_S = 0.8
FLAG_DELTA_FLOOR_S = 0.4
MAX_ADJUDICATED = 8
CHILD_TIMEOUT_S = 1800
# catalog-level drift bar (r12 verdict #1): the common-query TOTAL can
# drift >10% from uniform ambient weather across ~200 sub-floor queries
# without any per-query mover flagging — exactly the aggregate signal a
# round could misread as a regression. Over this bar, a stratified
# sample re-times on both trees side by side.
CATALOG_DRIFT_RATIO = 1.10
CATALOG_SAMPLE_K = 10


def _git(repo: Path, *args: str) -> str:
    return subprocess.run(
        ["git", "-C", str(repo), *args],
        capture_output=True, text=True, check=True, timeout=120,
    ).stdout.strip()


def find_prev_round(repo: Path) -> tuple[int, str] | None:
    """(round number, commit sha) of the previous round's final code:
    the commit that ADDED the newest ``BENCH_r{N}.json`` is the driver's
    round-boundary commit, whose tree is that round's final code and
    whose ``BENCH_DETAIL.json`` is that round's full per-query bench.

    Rounds are tried in DESCENDING order, falling back to the next-lower
    round whose add-commit resolves (r11 advice): mid-round the newest
    BENCH_rN.json on disk is often the driver's still-UNCOMMITTED current
    artifact — git log finds no add-commit for it, and bailing out there
    would silently disable the guard precisely at round boundaries."""
    rounds = []
    for p in repo.glob("BENCH_r*.json"):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", p.name)
        if m:
            rounds.append(int(m.group(1)))
    for n in sorted(rounds, reverse=True):
        try:
            sha = _git(
                repo, "log", "--diff-filter=A", "--format=%H", "--",
                f"BENCH_r{n:02d}.json",
            ).splitlines()
        except subprocess.CalledProcessError:
            continue  # e.g. unborn branch — treat as unresolvable
        if sha:
            return (n, sha[0])
    return None


def prev_round_timings(repo: Path, commit: str) -> dict[str, float]:
    """Full per-query minimums of the previous round's bench — the
    ``queries`` map of BENCH_DETAIL.json as committed at the round
    boundary (the driver commits its own run's detail)."""
    raw = _git(repo, "show", f"{commit}:BENCH_DETAIL.json")
    return {k: float(v) for k, v in json.loads(raw)["queries"].items()}


def flag_movers(
    cur: dict[str, float], prev: dict[str, float]
) -> list[tuple[str, float, float]]:
    """(name, cur_s, prev_s) for every common query over the mover bar,
    worst ratio first."""
    out = []
    for name, cur_s in cur.items():
        prev_s = prev.get(name)
        if prev_s is None or prev_s < FLAG_PREV_FLOOR_S:
            continue
        if cur_s > FLAG_RATIO * prev_s and cur_s - prev_s > FLAG_DELTA_FLOOR_S:
            out.append((name, cur_s, prev_s))
    return sorted(out, key=lambda t: t[1] / t[2], reverse=True)


def ensure_worktree(repo: Path, commit: str) -> Path:
    wt = Path(f"/tmp/ab_prev_{commit[:10]}")
    if not (wt / "tools" / "time_queries.py").exists():
        subprocess.run(
            ["git", "-C", str(repo), "worktree", "prune"],
            capture_output=True, timeout=60,
        )
        if wt.exists():
            subprocess.run(
                ["git", "-C", str(repo), "worktree", "remove", "--force", str(wt)],
                capture_output=True, timeout=60,
            )
        _git(repo, "worktree", "add", "--detach", str(wt), commit)
    return wt


_MIN_RE = re.compile(r"^(\S+): .*min=([\d.]+)s", re.M)


def time_subset(
    tree: Path, names: list[str], sf_dir: str, repeat: int = 3
) -> dict[str, float]:
    """Run ``tree``'s own tools/time_queries.py over ``names`` in a
    fresh subprocess (its sys.path points at ``tree``, so the queries
    AND every operator they lazily import come from that code version —
    an in-process module swap cannot guarantee that) and parse the
    stable ``name: ... min=X.XXs`` lines. repeat=3: the child session's
    warm-up is lighter than bench.py's, so the FIRST run of the first
    query carries several seconds of JIT/Arrow/broadcast cold cost —
    measured 9.1s -> 2.9s -> 2.8s on a 2.8s query — and a min-of-2
    cannot escape it; min-of-3 does."""
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [sys.executable, str(tree / "tools" / "time_queries.py"),
         sf_dir, *names, "--repeat", str(repeat)],
        capture_output=True, text=True, cwd=str(tree),
        timeout=CHILD_TIMEOUT_S, env=env,
    )
    if r.returncode != 0:
        raise RuntimeError(
            f"time_queries child in {tree} rc={r.returncode}: "
            f"{(r.stderr or '')[-500:]}"
        )
    return {m.group(1): float(m.group(2)) for m in _MIN_RE.finditer(r.stdout)}


_BATCH_WALL_KEYS = ("dns_batch_wall", "dns_batch_wall_concurrent")

# Runs in a FRESH subprocess with sys.path pointed at one tree, so the
# batch unit (and everything it lazily imports) comes from that code
# version — the same isolation rule time_subset applies to the catalog.
# min-of-N for the same reason as time_subset's repeat=3.
_BATCH_SNIPPET = r"""
import json, sys
sys.path.insert(0, sys.argv[1])
from bench import _dns_batch, _dns_batch_concurrent, _warm
from dnsflow_clickhouse_spark.session import get_spark
tree, sf_dir, repeat = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = get_spark(app_name="ab-batch")
_warm(spark, sf_dir)
seq = min(_dns_batch(spark, sf_dir)[0] for _ in range(repeat))
con = min(_dns_batch_concurrent(spark, sf_dir) for _ in range(repeat))
print(json.dumps({"dns_batch_wall": round(seq, 3),
                  "dns_batch_wall_concurrent": round(con, 3)}))
"""


def time_batch_walls(
    tree: Path, sf_dir: str, repeat: int = 3
) -> dict[str, float]:
    """Min-of-``repeat`` DNS batch walls (sequential + concurrent) on
    ``tree``'s code in a fresh subprocess; parses the single JSON line."""
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [sys.executable, "-c", _BATCH_SNIPPET, str(tree), sf_dir,
         str(repeat)],
        capture_output=True, text=True, cwd=str(tree),
        timeout=CHILD_TIMEOUT_S, env=env,
    )
    if r.returncode != 0:
        raise RuntimeError(
            f"batch-wall child in {tree} rc={r.returncode}: "
            f"{(r.stderr or '')[-500:]}"
        )
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    return {k: float(v) for k, v in json.loads(line).items()}


def _is_reg(pc: float, cc: float) -> bool:
    return cc > FLAG_RATIO * pc and cc - pc > FLAG_DELTA_FLOOR_S


def stratified_sample(
    cur: dict[str, float], prev: dict[str, float], k: int = CATALOG_SAMPLE_K
) -> list[str]:
    """~k common queries spread across the previous round's wall
    distribution: the common set sorted by prev min ascending, sampled
    at k evenly spaced rank positions (both tails always included).
    Spread-not-just-movers is the point (r12 verdict #1): uniform
    ambient drift lives in the sub-floor mass the per-query mover rule
    never re-times, so the sample must cover it — not only the heavy
    tail."""
    common = sorted((n for n in cur if n in prev), key=lambda n: prev[n])
    if len(common) <= k:
        return common
    idx = sorted({round(i * (len(common) - 1) / (k - 1)) for i in range(k)})
    return [common[i] for i in idx]


def _adjudicate_catalog(
    repo: Path,
    commit: str,
    cur: dict[str, float],
    prev_t: dict[str, float],
    sf_dir: str,
) -> dict:
    """Catalog-level drift verdict (r12 verdict #1). Always emits the
    common-query totals; when the current total exceeds
    ``CATALOG_DRIFT_RATIO`` x the previous round's, re-times a
    stratified ~``CATALOG_SAMPLE_K``-query sample on BOTH trees back to
    back (fresh subprocess each, min-of-3) and verdicts on the sample's
    total ratio — with a swapped-order confirm pass before calling it a
    regression, mirroring the per-query protocol."""
    common = [n for n in cur if n in prev_t]
    total_prev = round(sum(prev_t[n] for n in common), 3)
    total_cur = round(sum(cur[n] for n in common), 3)
    out: dict = {
        "n_common": len(common),
        "common_total_prev": total_prev,
        "common_total_cur": total_cur,
        "drift_ratio": round(total_cur / total_prev, 3) if total_prev else None,
    }
    if not common or total_prev <= 0 or (
        total_cur <= CATALOG_DRIFT_RATIO * total_prev
    ):
        out["verdict"] = "not_flagged"
        return out
    sample = stratified_sample(cur, prev_t)
    out["sample"] = sample
    wt = ensure_worktree(repo, commit)
    prev_code = time_subset(wt, sample, sf_dir)
    cur_code = time_subset(repo, sample, sf_dir)
    names = [n for n in sample if n in prev_code and n in cur_code]
    if not names:
        out["verdict"] = "unadjudicated"
        return out
    ps = sum(prev_code[n] for n in names)
    cs = sum(cur_code[n] for n in names)
    if ps > 0 and cs > CATALOG_DRIFT_RATIO * ps:
        # tentative regression: one more pair of passes, order swapped
        # (current tree first), min across passes per query — one noisy
        # pair cannot convict the whole catalog
        cur2 = time_subset(repo, names, sf_dir)
        prev2 = time_subset(wt, names, sf_dir)
        for n in names:
            if n in cur2:
                cur_code[n] = min(cur_code[n], cur2[n])
            if n in prev2:
                prev_code[n] = min(prev_code[n], prev2[n])
        ps = sum(prev_code[n] for n in names)
        cs = sum(cur_code[n] for n in names)
        out["confirm_pass"] = True
    out["sample_prev_code_s"] = round(ps, 3)
    out["sample_cur_code_s"] = round(cs, 3)
    out["sample_ratio"] = round(cs / ps, 3) if ps > 0 else None
    out["verdict"] = (
        "regression" if ps > 0 and cs > CATALOG_DRIFT_RATIO * ps
        else "ambient"
    )
    return out


def _adjudicate_batch_walls(
    repo: Path, commit: str, batch_walls: dict[str, float], sf_dir: str
) -> list[dict]:
    """Mover rule + side-by-side re-time for the two headline batch
    walls. Always emits one row per wall (flagged or not) so the
    artifact shows the walls are UNDER adjudication, not just silent."""
    raw = json.loads(_git(repo, "show", f"{commit}:BENCH_DETAIL.json"))
    rows: list[dict] = []
    for key in _BATCH_WALL_KEYS:
        cur_s = batch_walls.get(key)
        prev_s = raw.get(key)
        flagged = (
            isinstance(cur_s, (int, float))
            and isinstance(prev_s, (int, float))
            and prev_s >= FLAG_PREV_FLOOR_S
            and _is_reg(prev_s, cur_s)
        )
        rows.append({
            "name": key,
            "prev_round_s": prev_s,
            "final_bench_s": cur_s,
            "flagged": flagged,
        })
    names = [r["name"] for r in rows if r["flagged"]]
    if names:
        try:
            wt = ensure_worktree(repo, commit)
            prev_code = time_batch_walls(wt, sf_dir)
            cur_code = time_batch_walls(repo, sf_dir)
            for row in rows:
                if not row["flagged"]:
                    continue
                pc = prev_code.get(row["name"])
                cc = cur_code.get(row["name"])
                row["prev_code_s"] = pc
                row["cur_code_s"] = cc
                if pc is None or cc is None:
                    row["verdict"] = "unadjudicated"
                else:
                    row["ratio"] = round(cc / pc, 3) if pc > 0 else None
                    row["verdict"] = (
                        "regression" if _is_reg(pc, cc) else "ambient"
                    )
        except Exception as exc:
            for row in rows:
                if row["flagged"]:
                    row["verdict"] = "unadjudicated"
                    row["error"] = f"{type(exc).__name__}: {exc}"[:200]
    return rows


def adjudicate(
    repo: Path,
    cur_timings: dict[str, float],
    sf_dir: str,
    batch_walls: dict[str, float] | None = None,
) -> dict:
    """The full protocol; returns the ``ab`` section for the bench
    artifact. ``batch_walls``: this run's headline envelope numbers
    ({dns_batch_wall, dns_batch_wall_concurrent}) — adjudicated under
    the same mover rule against the previous round's BENCH_DETAIL
    (r11 verdict #4), with a side-by-side subprocess re-time of the
    batch unit on both trees when either wall flags. Never raises."""
    try:
        prev = find_prev_round(repo)
        if prev is None:
            return {"prev_round": None, "flagged": []}
        n, commit = prev
        prev_t = prev_round_timings(repo, commit)
        movers = flag_movers(cur_timings, prev_t)
        section: dict = {
            "prev_round": n,
            "prev_commit": commit[:10],
            "policy": (
                f"mover >{FLAG_RATIO}x prev-round min (floors "
                f"{FLAG_PREV_FLOOR_S}/{FLAG_DELTA_FLOOR_S}s) -> side-by-side "
                "re-time on prev-round worktree vs current tree, fresh "
                "subprocess each, min-of-3; tentative regressions get a "
                "swapped-order confirm pass and the verdict uses the min "
                "across passes; common-query catalog TOTAL drift "
                f">{CATALOG_DRIFT_RATIO}x additionally re-times a "
                f"~{CATALOG_SAMPLE_K}-query stratified sample on both trees"
            ),
            "flagged": [],
        }
        if batch_walls:
            section["batch_walls"] = _adjudicate_batch_walls(
                repo, commit, batch_walls, sf_dir
            )
        # catalog-level verdict (r12 verdict #1) — isolated so a
        # failure here cannot take down the per-query adjudication
        try:
            section["catalog"] = _adjudicate_catalog(
                repo, commit, cur_timings, prev_t, sf_dir
            )
        except Exception as exc:
            section["catalog"] = {
                "verdict": "unadjudicated",
                "error": f"{type(exc).__name__}: {exc}"[:200],
            }
        if not movers:
            return section
        if len(movers) > MAX_ADJUDICATED:
            section["truncated_movers"] = len(movers) - MAX_ADJUDICATED
            movers = movers[:MAX_ADJUDICATED]
        names = [m[0] for m in movers]
        wt = ensure_worktree(repo, commit)
        prev_code = time_subset(wt, names, sf_dir)
        cur_code = time_subset(repo, names, sf_dir)

        # confirmation pass: a tentative regression re-times BOTH sides
        # once more (order swapped — current tree first), and the final
        # verdict uses the min across passes. One noisy pair cannot
        # convict; the cost lands only on tentative regressions, which
        # are rare.
        tentative = [
            n for n in names
            if prev_code.get(n) is not None and cur_code.get(n) is not None
            and _is_reg(prev_code[n], cur_code[n])
        ]
        if tentative:
            cur2 = time_subset(repo, tentative, sf_dir)
            prev2 = time_subset(wt, tentative, sf_dir)
            for n in tentative:
                if n in cur2:
                    cur_code[n] = min(cur_code[n], cur2[n])
                if n in prev2:
                    prev_code[n] = min(prev_code[n], prev2[n])
            section["confirm_pass"] = sorted(tentative)

        for name, cur_s, prev_s in movers:
            pc, cc = prev_code.get(name), cur_code.get(name)
            if pc is None or cc is None:
                verdict = "unadjudicated"
                ratio = None
            else:
                ratio = round(cc / pc, 3) if pc > 0 else None
                verdict = "regression" if _is_reg(pc, cc) else "ambient"
            section["flagged"].append({
                "query": name,
                "prev_round_s": round(prev_s, 3),
                "final_bench_s": round(cur_s, 3),
                "prev_code_s": pc,
                "cur_code_s": cc,
                "ratio": ratio,
                "verdict": verdict,
            })
        return section
    except Exception as exc:  # the bench must survive the adjudicator
        return {
            "prev_round": None,
            "error": f"{type(exc).__name__}: {exc}"[:300],
            "flagged": [],
        }


def main() -> None:
    """CLI: ``python tools/ab_bench.py [sf_dir]`` reads the current
    BENCH_DETAIL.json as 'this run' and adjudicates it — the manual
    form of what bench.py now does inline."""
    repo = Path(__file__).resolve().parent.parent
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    detail = json.loads((repo / "BENCH_DETAIL.json").read_text())
    cur = {k: float(v) for k, v in detail["queries"].items()}
    walls = {
        k: float(detail[k]) for k in _BATCH_WALL_KEYS if k in detail
    }
    print(json.dumps(adjudicate(repo, cur, sf_dir, walls or None), indent=1))


if __name__ == "__main__":
    main()
