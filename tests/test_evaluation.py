"""Unit tests for the model-evaluation operators on handcrafted inputs
with known closed-form answers; sf-scale hash parity is covered by the
DuckDB oracles in catalog_eval."""

from __future__ import annotations

from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.operators.evaluation import (
    auc_by_group,
    calibration_bins,
    correlation_pairs,
    ols_fit,
)


def test_auc_perfect_and_reversed_and_ties(spark):
    rows = (
        # group 'p': perfect separation -> AUC 1
        [("p", 10, 1), ("p", 9, 1), ("p", 1, 0), ("p", 2, 0)]
        # group 'r': perfectly reversed -> AUC 0
        + [("r", 1, 1), ("r", 10, 0)]
        # group 't': all scores tie -> AUC 1/2
        + [("t", 5, 1), ("t", 5, 0), ("t", 5, 1), ("t", 5, 0)]
        # group 'n': no negatives -> NULL
        + [("n", 3, 1), ("n", 4, 1)]
    )
    df = spark.createDataFrame(rows, "g string, s long, y long")
    got = {r.g: r for r in auc_by_group(df, "g", "s", "y").collect()}
    assert got["p"].auc_ppm == 1_000_000
    assert got["r"].auc_ppm == 0
    assert got["t"].auc_ppm == 500_000
    assert got["n"].auc_ppm is None and got["n"].n_neg == 0


def test_auc_mixed_matches_pair_enumeration(spark):
    # scores: pos {3, 5}, neg {3, 4} -> pairs: (3,3) tie=.5, (3,4) 0,
    # (5,3) 1, (5,4) 1 -> AUC = 2.5/4 = 0.625
    rows = [("g", 3, 1), ("g", 5, 1), ("g", 3, 0), ("g", 4, 0)]
    df = spark.createDataFrame(rows, "g string, s long, y long")
    [r] = auc_by_group(df, "g", "s", "y").collect()
    assert r.auc_ppm == 625_000


def test_calibration_bins_exact_rates(spark):
    # bin 0 = [0, 100000): scores 0 and 99999, one pos of two -> rate 500000
    # top bin via clamp: score exactly 1e6 lands in bin 9, pos -> 1e6
    rows = [(0, 1), (99_999, 0), (1_000_000, 1)]
    df = spark.createDataFrame(rows, "score long, y long")
    got = {r.bin: r for r in calibration_bins(df, "score", "y", 10).collect()}
    assert got[0].n == 2 and got[0].pos_rate_ppm == 500_000
    assert got[0].avg_score_ppm == 49_999
    assert got[0].gap_ppm == 450_001
    assert got[9].n == 1 and got[9].pos_rate_ppm == 1_000_000


def test_correlation_exact_and_degenerate(spark):
    # y = 2x -> corr exactly 1.0; z constant -> NULL (not NaN)
    rows = [(1, 2, 7), (2, 4, 7), (3, 6, 7), (4, 8, 7)]
    df = spark.createDataFrame(rows, "x long, y long, z long")
    got = {(r.feat_x, r.feat_y): r for r in correlation_pairs(df, ["x", "y", "z"]).collect()}
    # sqrt(va)*sqrt(vb) carries one rounding step, so corr is 1.0 only
    # to within an ulp — the oracle matches because BOTH engines round
    # the same IEEE way, not because the value is exactly 1.
    assert abs(got[("x", "y")].corr - 1.0) < 1e-12
    assert got[("x", "z")].corr is None
    assert got[("y", "z")].corr is None
    assert all(r.n == 4 for r in got.values())


def test_ols_fit_recovers_exact_line(spark):
    # y = 3x + 1 exactly -> slope 3.0, intercept 1.0; constant-x group NULL
    rows = [("a", 1, 4), ("a", 2, 7), ("a", 3, 10), ("b", 5, 9), ("b", 5, 11)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r.g: r for r in ols_fit(df, "g", "x", "y").collect()}
    assert got["a"].slope == 3.0 and got["a"].intercept == 1.0
    assert got["b"].slope is None and got["b"].intercept is None


def test_auc_plan_aggregates_before_window(spark):
    # The window input must be the per-distinct-score aggregate, not raw
    # rows: assert the plan has a partial aggregate below the Window.
    df = spark.createDataFrame(
        [("g", i % 7, i % 2) for i in range(100)], "g string, s long, y long"
    )
    plan = auc_by_group(df, "g", "s", "y")._jdf.queryExecution().executedPlan().toString()
    # plans print top-down: an aggregate BELOW the window appears after it
    assert plan.rindex("HashAggregate") > plan.index("Window")


# ---------------------------------------------------------------------------
# retrieval: l2_topk / rrf_fuse / random_projection
# ---------------------------------------------------------------------------

def test_l2_topk_exact_integer_distances(spark):
    from dnsflow_clickhouse_spark.operators.similarity import l2_topk

    rows = [
        (0, [1.0, 0.0]),   # query
        (1, [1.0, 0.0]),   # identical -> dist 0
        (2, [0.0, 0.0]),   # dist (1e4)^2
        (3, [3.0, 4.0]),   # dist (2e4)^2 + (4e4)^2
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = l2_topk(
        df.filter("vec_id = 0"), df, "vec_id", "embedding", 3
    ).collect()
    by_rank = {r.rnk: r for r in got}
    assert by_rank[1].neighbor_id == 1 and by_rank[1].dist_sq == 0
    assert by_rank[2].neighbor_id == 2 and by_rank[2].dist_sq == 10_000**2
    assert by_rank[3].dist_sq == 20_000**2 + 40_000**2


def test_rrf_fuse_combines_and_handles_missing(spark):
    from dnsflow_clickhouse_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2)], "query_id long, neighbor_id long, rnk long"
    )
    b = spark.createDataFrame(
        [(0, 10, 2), (0, 12, 1)], "query_id long, neighbor_id long, rnk long"
    )
    got = {r.neighbor_id: r for r in rrf_fuse(a, b, k=3, rrf_k=60).collect()}
    # 10 in both: 1e6//61 + 1e6//62; 11 only in a: 1e6//62; 12 only in b: 1e6//61
    assert got[10].rrf_micro == 1_000_000 // 61 + 1_000_000 // 62
    assert got[11].rrf_micro == 1_000_000 // 62
    assert got[12].rrf_micro == 1_000_000 // 61
    assert got[10].rnk == 1  # fused winner is the doc both rankers saw


def test_random_projection_components_are_exact_signed_sums(spark):
    from dnsflow_clickhouse_spark.functions.textfn import POLY_MOD
    from dnsflow_clickhouse_spark.operators.similarity import random_projection

    rows = [(0, [1.0, -2.0]), (1, [0.5, 0.25])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = random_projection(df, "vec_id", "embedding", 2, seed=3).collect()
    # replicate: sign(fid) from poly_hash(str(fid), seed=3) % 2
    def ph(s: str, seed: int) -> int:
        h = seed
        for ch in s:
            h = (h * 31 + ord(ch)) % POLY_MOD
        return h

    sign = {f: (1 if ph(str(f), 3) % 2 == 0 else -1) for f in range(4)}
    q = {0: [10000, -20000], 1: [5000, 2500]}
    want = {
        (vid, k): sum(sign[j * 2 + k] * q[vid][j] for j in range(2))
        for vid in q
        for k in range(2)
    }
    assert {(r.vec_id, r.out_idx): r.component for r in got} == want


def test_psi_report_hand_replay_and_zero_drift(spark):
    import math

    from pyspark.sql import functions as F

    from dnsflow_clickhouse_spark.operators.evaluation import psi_report

    def q(x):
        return math.floor(math.log2(x) * 1_000_000 + 0.5)

    def share(c, n, B):
        return (c + 1) * 1_000_000 // (n + B)

    def psi_pico(ref, cur):
        B = len(ref)
        n_r, n_c = sum(ref), sum(cur)
        tot = 0
        for cr, cc in zip(ref, cur):
            ratio = ((cc + 1) / (cr + 1)) * ((n_r + B) / (n_c + B))
            tot += (share(cc, n_c, B) - share(cr, n_r, B)) * q(ratio)
        return tot

    # g1: total reversal across 2 buckets; g2: identical -> psi == 0;
    # g3: bucket 1 empty on BOTH sides but slice sizes differ -> the
    # spine must still replay its smoothed term
    rows = []
    rows += [("g1", 0, 0)] * 10 + [("g1", 1, 1)] * 10
    rows += [("g2", 0, 0)] * 5 + [("g2", 0, 1)] * 5
    rows += [("g2", 1, 0)] * 5 + [("g2", 1, 1)] * 5
    rows += [("g3", 0, 0)] * 9 + [("g3", 0, 1)] * 3
    df = spark.createDataFrame(rows, "grp string, b long, cur int")
    out = {
        r.grp: r
        for r in psi_report(
            df, "grp", F.col("cur") == 1, F.col("b"), 2
        ).collect()
    }
    assert out["g1"].psi_pico == psi_pico([10, 0], [0, 10])
    assert out["g1"].psi_bits > 4  # total reversal = massive drift
    assert out["g2"].psi_pico == psi_pico([5, 5], [5, 5]) == 0
    assert out["g3"].psi_pico == psi_pico([9, 0], [3, 0])
    assert (out["g3"].n_ref, out["g3"].n_cur) == (9, 3)


def test_ndcg_hand_replay_and_edge_cases(spark):
    import math

    from dnsflow_clickhouse_spark.operators.evaluation import ndcg_by_group

    # g1: actual ranking by score desc = [1(rel),2,3(rel),4]; k=2 ->
    # DCG = disc(1); ideal top-2 = both relevant -> IDCG = disc(1)+disc(2)
    # g2: perfect ranking -> ndcg == 1e6 ; g3: no relevant -> NULL
    rows = [
        ("g1", 1, 90, 1), ("g1", 2, 80, 0), ("g1", 3, 70, 1), ("g1", 4, 60, 0),
        ("g2", 5, 99, 1), ("g2", 6, 50, 0),
        ("g3", 7, 10, 0), ("g3", 8, 20, 0),
    ]
    df = spark.createDataFrame(rows, "g string, id long, s long, r long")
    out = {
        r["g"]: r
        for r in ndcg_by_group(
            df, "g", "id", F.col("s"), F.col("r"), k=2
        ).collect()
    }

    def disc(rk):
        return math.floor(1_000_000.0 / math.log2(rk + 1) + 0.5)

    g1 = out["g1"]
    assert (g1["dcg_micro"], g1["idcg_micro"]) == (disc(1), disc(1) + disc(2))
    assert g1["ndcg_ppm"] == disc(1) * 1_000_000 // (disc(1) + disc(2))
    assert out["g2"]["ndcg_ppm"] == 1_000_000  # perfect ranking
    assert out["g3"]["ndcg_ppm"] is None  # no relevant rows: undefined
    assert out["g3"]["idcg_micro"] == 0


def test_spearman_perfect_reversed_and_scrambled(spark):
    from dnsflow_clickhouse_spark.operators.evaluation import spearman_by_group

    rows = (
        # monotone increasing -> rho 1.0 (sum_d2 = 0)
        [("m", i, float(i), i * 10) for i in range(1, 6)]
        # perfectly reversed -> rho -1.0
        + [("r", i, float(i), -i) for i in range(1, 6)]
    )
    df = spark.createDataFrame(rows, "g string, id long, x double, y long")
    got = {
        r.g: r
        for r in spearman_by_group(
            df, "g", "id", F.col("x"), F.col("y")
        ).collect()
    }
    assert got["m"].sum_d2 == 0 and got["m"].rho_ppm == 1_000_000
    assert got["r"].rho_ppm == -1_000_000
    # pure-python replay of a scrambled permutation: crisp ranks by
    # (value, id), rho_ppm = 1e6 - 6e6*sum_d2 // (n^3 - n)
    xs = [3.0, 1.0, 2.0, 5.0, 4.0]
    ys = [10, 30, 20, 40, 50]
    rows2 = [("s", i + 1, xs[i], ys[i]) for i in range(5)]
    df2 = spark.createDataFrame(rows2, "g string, id long, x double, y long")
    rx = {i: r for r, i in enumerate(sorted(range(5), key=lambda i: (xs[i], i)), 1)}
    ry = {i: r for r, i in enumerate(sorted(range(5), key=lambda i: (ys[i], i)), 1)}
    sum_d2 = sum((rx[i] - ry[i]) ** 2 for i in range(5))
    want = 1_000_000 - (6_000_000 * sum_d2) // (5**3 - 5)
    got2 = spearman_by_group(df2, "g", "id", F.col("x"), F.col("y")).collect()[0]
    assert got2.sum_d2 == sum_d2 and got2.rho_ppm == want


def test_prf1_by_class_counts_and_identities(spark):
    from dnsflow_clickhouse_spark.operators.evaluation import prf1_by_class

    # truth: a,a,a,b,b,c  pred: a,a,b,b,a,d
    rows = [("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "a"), ("c", "d")]
    df = spark.createDataFrame(rows, "t string, p string")
    got = {r.cls: r for r in prf1_by_class(df, "t", "p").collect()}
    a = got["a"]
    assert (a.n_true, a.n_pred, a.tp) == (3, 3, 2)
    assert a.precision_ppm == 2 * 1_000_000 // 3
    assert a.recall_ppm == 2 * 1_000_000 // 3
    assert a.f1_ppm == 2 * 2 * 1_000_000 // 6
    # class 'd' never in truth: precision 0, recall NULL
    d = got["d"]
    assert (d.n_true, d.n_pred, d.tp) == (0, 1, 0)
    assert d.precision_ppm == 0 and d.recall_ppm is None
    # class 'c' never predicted: recall 0, precision NULL
    c = got["c"]
    assert c.precision_ppm is None and c.recall_ppm == 0


def test_brier_by_group_exact(spark):
    from dnsflow_clickhouse_spark.operators.evaluation import brier_by_group

    # (score_ppm, y): errors 0.2^2 and 0.4^2 -> mean 0.1 in micro^2
    rows = [("g", 800_000, 1), ("g", 400_000, 0)]
    df = spark.createDataFrame(rows, "g string, s long, y long")
    got = brier_by_group(df, "g", "s", "y").collect()[0]
    want = ((800_000 - 1_000_000) ** 2 + 400_000**2) // 2
    assert (got.n, got.n_pos, got.brier_micro2) == (2, 1, want)


def test_average_precision_known_cases(spark):
    from dnsflow_clickhouse_spark.operators.evaluation import (
        average_precision_by_group,
    )

    rows = (
        # 'p': both positives ranked top -> AP = 1.0
        [("p", 1, 10, 1), ("p", 2, 9, 1), ("p", 3, 2, 0), ("p", 4, 1, 0)]
        # 'w': single positive ranked LAST of 3 -> AP = 1/3
        + [("w", 1, 9, 0), ("w", 2, 8, 0), ("w", 3, 1, 1)]
        # 'm': positives at ranks 1 and 3 -> AP = (1/1 + 2/3) / 2
        + [("m", 1, 9, 1), ("m", 2, 8, 0), ("m", 3, 7, 1)]
        # 'z': no positives -> NULL
        + [("z", 1, 5, 0)]
    )
    df = spark.createDataFrame(rows, "g string, id long, s long, y long")
    got = {
        r.g: r
        for r in average_precision_by_group(
            df, "g", "id", F.col("s"), "y"
        ).collect()
    }
    assert got["p"].ap_ppm == 1_000_000
    assert got["w"].ap_ppm == 1_000_000 // 3
    # per-term ppm floors first, then the mean floors: (1e6 + 666666)//2
    assert got["m"].ap_ppm == (1_000_000 + 2 * 1_000_000 // 3) // 2
    assert got["z"].ap_ppm is None


def test_good_turing_vocab_hand_counts(spark):
    from dnsflow_clickhouse_spark.operators.lm import good_turing_vocab

    # tokens: a a a b b c d e -> N=8 V=5 f1=3 (c,d,e) f2=1 (b)
    rows = [("s", ["a", "a", "a", "b"]), ("s", ["b", "c", "d", "e"])]
    df = spark.createDataFrame(rows, "g string, toks array<string>")
    got = good_turing_vocab(df, "g", F.col("toks")).collect()[0]
    assert (got.n_tokens, got.vocab, got.f1, got.f2) == (8, 5, 3, 1)
    assert got.gt_unseen_ppm == 3 * 1_000_000 // 8
    assert got.chao1_vocab == 5 + (3 * 2) // (2 * (1 + 1))


def test_roc_points_known_curve(spark):
    from dnsflow_clickhouse_spark.operators.evaluation import (
        roc_points_by_group,
    )

    # scores 4>3>2>1 with labels 1,1,0,1: thresholds walk the curve
    rows = [("g", 4, 1), ("g", 3, 1), ("g", 2, 0), ("g", 1, 1)]
    df = spark.createDataFrame(rows, "g string, s long, y long")
    got = {
        r.s: r for r in roc_points_by_group(df, "g", "s", "y").collect()
    }
    third = 1_000_000 // 3
    assert (got[4].tpr_ppm, got[4].fpr_ppm) == (third, 0)
    assert (got[3].tpr_ppm, got[3].fpr_ppm) == (2 * third, 0)
    assert (got[2].tpr_ppm, got[2].fpr_ppm) == (2 * third, 1_000_000)
    assert (got[1].tpr_ppm, got[1].fpr_ppm) == (1_000_000, 1_000_000)


def test_zipf_decay_exact_powerlaw(spark):
    import math

    from dnsflow_clickhouse_spark.operators.lm import zipf_decay_by_group

    # exact power law: count(rank r) = 2^(10 - r) -> slope exactly -1
    # per doubling, i.e. log2(c) = 10 - log2-ish... build counts so
    # that log2(count) = 16 - 2*log2(rank) exactly at ranks 1,2,4,8:
    # rank 1 -> 2^16, rank 2 -> 2^14, rank 4 -> 2^12, rank 8 -> 2^10
    toks = []
    counts = {"a": 2**16, "b": 2**14, "c": 2**12, "d": 2**12, "e": 2**12,
              "f": 2**10, "g": 2**10, "h": 2**10, "i": 2**10}
    rows = [("g", [t] * c) for t, c in counts.items()]
    df = spark.createDataFrame(rows, "g string, toks array<string>")
    got = zipf_decay_by_group(df, "g", "toks").collect()[0]
    # python replay with the same quantization
    pts = []
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    for r, (t, c) in enumerate(ordered, 1):
        q = lambda v: math.floor(math.log2(v) * 1_000_000 + 0.5)
        pts.append((q(r), q(c)))
    n = len(pts)
    sx = sum(p[0] for p in pts); sy = sum(p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts); sxy = sum(p[0] * p[1] for p in pts)
    want = (sx * sy - n * sxy) * 1_000_000 // (n * sxx - sx * sx)
    assert got.n_types == n and got.zipf_decay_micro == want
    # decaying power law: exponent strictly positive and near 2e6
    assert 1_500_000 < got.zipf_decay_micro < 2_500_000
