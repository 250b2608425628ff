"""A/B: literal-beta IRLS (current) vs broadcast-parameter IRLS, one session."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from movie_genre_data_pipeline_spark.session import build_session
from movie_genre_data_pipeline_spark.functions.regression import (
    SIGMOID_MICRO_SQL, LOGREG_W_SQL, LOGREG_R_SQL, DELTA_MICRO12_SQL,
    logreg_irls_micro,
)
from movie_genre_data_pipeline_spark.suite import all_queries

SF = "/root/testdata/sf0.1"
spark = build_session(app_name="exp-logreg")
specs = all_queries()
li = spark.read.parquet(f"{SF}/lineitem.parquet")
li.groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()

_LOGREG_ZT = None
import movie_genre_data_pipeline_spark.suite.sampling_queries as SQ


def labeled_input():
    o = spark.read.parquet(f"{SF}/orders.parquet")
    feats = o.select(
        (F.col("o_orderkey") % 180 + 60).cast("bigint").alias("x1"),
        (F.col("o_custkey") % 25).cast("bigint").alias("x2"),
        F.conv(
            F.substring(F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(":logreg"))), 1, 12),
            16, 10,
        ).cast("bigint").alias("u48"),
    ).withColumn("zt", F.expr(SQ._LOGREG_ZT))
    return feats.select("x1", "x2", F.expr(SQ._LOGREG_LABEL).alias("y"))


def irls_param(df, x1, x2, y, iters=4):
    feats = df.select(
        F.col(x1).cast("bigint").alias("x1"),
        F.col(x2).cast("bigint").alias("x2"),
        F.col(y).cast("bigint").alias("y"),
    ).cache()
    beta = (0, 0, 0)
    rows = []
    dec = "decimal(38,0)"
    sess = df.sparkSession

    def scored_for(b):
        bf = sess.createDataFrame([b], "b0 bigint, b1 bigint, b2 bigint")
        return (
            feats.crossJoin(F.broadcast(bf))
            .select(
                "x1", "x2", "y",
                (F.col("b0") + F.col("b1") * F.col("x1") + F.col("b2") * F.col("x2")).alias("z_micro"),
            )
            .withColumn("mu_micro", F.expr(SIGMOID_MICRO_SQL))
        )

    acc_cols = [
        F.sum(F.when((F.col("z_micro") > 0) == (F.col("y") == 1), F.lit(1)).otherwise(F.lit(0))).cast("bigint").alias("n_correct"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    ]
    for t in range(1, iters + 1):
        scored = scored_for(beta)
        wr = scored.select("x1", "x2", "y", "z_micro", F.expr(LOGREG_W_SQL).alias("w"), F.expr(LOGREG_R_SQL).alias("r"))
        g = wr.agg(
            F.sum(F.col("w").cast(dec)).alias("ni"),
            F.sum((F.col("w") * F.col("x1")).cast(dec)).alias("sx1i"),
            F.sum((F.col("w") * F.col("x2")).cast(dec)).alias("sx2i"),
            F.sum(F.col("r").cast(dec)).alias("syi"),
            F.sum((F.col("w") * F.col("x1") * F.col("x1")).cast(dec)).alias("s11i"),
            F.sum((F.col("w") * F.col("x1") * F.col("x2")).cast(dec)).alias("s12i"),
            F.sum((F.col("w") * F.col("x2") * F.col("x2")).cast(dec)).alias("s22i"),
            F.sum((F.col("x1") * F.col("r")).cast(dec)).alias("s1yi"),
            F.sum((F.col("x2") * F.col("r")).cast(dec)).alias("s2yi"),
            *acc_cols,
        )
        d = g.select(
            F.col("ni").cast("double").alias("n"),
            F.col("sx1i").cast("double").alias("sx1"),
            F.col("sx2i").cast("double").alias("sx2"),
            F.col("syi").cast("double").alias("sy"),
            F.col("s11i").cast("double").alias("s11"),
            F.col("s12i").cast("double").alias("s12"),
            F.col("s22i").cast("double").alias("s22"),
            F.col("s1yi").cast("double").alias("s1y"),
            F.col("s2yi").cast("double").alias("s2y"),
            "n_correct", "n_rows",
        )
        step = d.select(
            F.expr(DELTA_MICRO12_SQL["d0"]).alias("d0"),
            F.expr(DELTA_MICRO12_SQL["d1"]).alias("d1"),
            F.expr(DELTA_MICRO12_SQL["d2"]).alias("d2"),
            "n_correct", "n_rows",
        ).collect()[0]
        if t > 1:
            rows.append((t - 1, beta[0], beta[1], beta[2], int(step["n_correct"]), int(step["n_rows"])))
        beta = (beta[0] + int(step["d0"]), beta[1] + int(step["d1"]), beta[2] + int(step["d2"]))
    acc = scored_for(beta).agg(*acc_cols).collect()[0]
    rows.append((iters, beta[0], beta[1], beta[2], int(acc["n_correct"]), int(acc["n_rows"])))
    feats.unpersist()
    return sess.createDataFrame(rows, "iter int, b0_micro bigint, b1_micro bigint, b2_micro bigint, n_correct bigint, n_rows bigint")


resA = resB = None
for rnd in range(3):
    t0 = time.time()
    dfa = logreg_irls_micro(labeled_input(), "x1", "x2", "y", iters=4)
    resA = [tuple(r) for r in dfa.collect()]
    ta = time.time() - t0
    t0 = time.time()
    dfb = irls_param(labeled_input(), "x1", "x2", "y", iters=4)
    resB = [tuple(r) for r in dfb.collect()]
    tb = time.time() - t0
    print(f"round {rnd}: literal={ta:.3f}s  param={tb:.3f}s")

print("IDENTICAL:", resA == resB)
print(resA)
