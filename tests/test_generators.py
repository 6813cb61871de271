"""Generator exactness tests (hyperbolic band join, LFR-like mixing)."""


def test_hyperbolic_band_join_is_exact(spark):
    # the banding must reproduce the brute-force n^2 threshold graph
    import math

    from networkit_spark.generators import hyperbolic

    n, k, gamma, seed = 120, 6.0, 3.0, 9
    g = hyperbolic(spark, n, avg_degree=k, exponent=gamma, seed=seed)
    got = {
        (r["src"], r["dst"]) for r in g.canonical().select("src", "dst").collect()
    }
    # recompute points exactly as the generator does
    from networkit_spark.generators import _unit_hash
    from pyspark.sql import functions as F

    alpha = (gamma - 1.0) / 2.0
    R = 2.0 * math.log(8.0 * n / (math.pi * k))
    pts = (
        spark.range(n)
        .select(
            F.col("id"),
            (_unit_hash(F.col("id"), F.lit(seed)) * (2 * math.pi)).alias("th"),
            (
                F.acosh(
                    _unit_hash(F.col("id"), F.lit(seed + 1))
                    * (math.cosh(alpha * R) - 1.0)
                    + 1.0
                )
                / alpha
            ).alias("r"),
        )
        .collect()
    )
    exp = set()
    for i in range(n):
        for j in range(i + 1, n):
            dth = abs(pts[i]["th"] - pts[j]["th"])
            dth = min(dth, 2 * math.pi - dth)
            coshd = math.cosh(pts[i]["r"]) * math.cosh(pts[j]["r"]) - math.sinh(
                pts[i]["r"]
            ) * math.sinh(pts[j]["r"]) * math.cos(dth)
            if coshd <= math.cosh(R) + 1e-12:
                exp.add((pts[i]["id"], pts[j]["id"]))
    assert got == exp
    assert len(exp) > 0


def test_lfr_like_mixing_and_partition(spark):
    from pyspark.sql import functions as F

    from networkit_spark.generators import lfr_like

    g, truth = lfr_like(spark, 300, avg_degree=8.0, mu=0.2, seed=4)
    labels = {r["id"]: r["label"] for r in truth.collect()}
    assert len(labels) == 300
    edges = g.canonical().select("src", "dst").collect()
    assert edges
    intra = sum(1 for r in edges if labels[r["src"]] == labels[r["dst"]])
    frac = intra / len(edges)
    # planted mixing: intra fraction tracks 1-mu (generous tolerance,
    # expected-degree realization)
    assert 0.6 <= frac <= 0.95
    # determinism
    g2, _ = lfr_like(spark, 300, avg_degree=8.0, mu=0.2, seed=4)
    same = {(r["src"], r["dst"]) for r in g2.canonical().select("src", "dst").collect()}
    assert same == {(r["src"], r["dst"]) for r in edges}
