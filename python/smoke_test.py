#!/usr/bin/env python3
"""Smoke test for the graft PySpark bindings.

Run against a local session with the graft jar on the classpath:

    sbt package
    GRAFT_JAR=target/scala-2.13/<graft jar> python3 python/smoke_test.py

Covers the full user workflow: fit (SE and KL), transform, predict,
computeCost, summary, save/load round-trip (Python-side load of a
Python-saved model), and param transfer fidelity.
"""

import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.ml.linalg import Vectors
from pyspark.sql import SparkSession

from graft.clustering import (
    CLARA,
    BisectingKMeans,
    GeneralizedKMeans,
    GeneralizedKMeansModel,
    KMedoids,
    MiniBatchKMeans,
    SoftKMeans,
    XMeans,
    minibatch_step,
)
from graft.streaming import StreamingKMeans, StreamingKMeansModel


def find_jar() -> str:
    jar = os.environ.get("GRAFT_JAR")
    if jar:
        return jar
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cands = glob.glob(os.path.join(root, "target", "scala-2.13", "*.jar"))
    cands = [c for c in cands if "sources" not in c and "javadoc" not in c]
    if not cands:
        raise SystemExit("no graft jar found: run `sbt package` or set GRAFT_JAR")
    return max(cands, key=os.path.getmtime)


def main() -> None:
    spark_jars = find_jar()
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("graft-python-smoke")
        .config("spark.jars", spark_jars)
        .config("spark.driver.extraClassPath", spark_jars)
        .config("spark.executor.extraClassPath", spark_jars)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        df = spark.createDataFrame(
            [(Vectors.dense([0.0, 0.0]),), (Vectors.dense([0.2, 0.1]),),
             (Vectors.dense([0.1, 0.3]),), (Vectors.dense([9.9, 10.1]),),
             (Vectors.dense([10.2, 9.8]),), (Vectors.dense([10.0, 10.0]),)],
            ["features"],
        )

        # --- squared Euclidean fit / transform / predict / cost ---
        km = GeneralizedKMeans(k=2, seed=7, maxIter=10, distanceCol="dist")
        model = km.fit(df)
        assert model.numClusters == 2, model.numClusters
        assert model.numFeatures == 2, model.numFeatures
        pred = model.transform(df)
        assert pred.columns == ["features", "prediction", "dist"], pred.columns
        assert pred.select("prediction").distinct().count() == 2
        # the two blobs separate perfectly
        a = model.predict(Vectors.dense([0.1, 0.1]))
        b = model.predict(Vectors.dense([10.0, 10.0]))
        assert a != b, (a, b)
        cost = model.computeCost(df)
        assert 0.0 < cost < 1.0, cost  # tight blobs -> tiny WCSS
        centers = model.clusterCenters()
        assert len(centers) == 2 and len(centers[0]) == 2
        s = model.summary
        assert s.algorithm == "GeneralizedKMeans" and s.k == 2
        assert s.numPoints == 6 and s.iterations >= 1
        print(f"SE fit ok: cost={cost:.4f} {s}")

        # --- KL divergence fit (simplex-ish positive data) ---
        kl_df = spark.createDataFrame(
            [(Vectors.dense([0.8, 0.1, 0.1]),), (Vectors.dense([0.7, 0.2, 0.1]),),
             (Vectors.dense([0.1, 0.1, 0.8]),), (Vectors.dense([0.1, 0.2, 0.7]),)],
            ["features"],
        )
        kl_model = GeneralizedKMeans(k=2, divergence="kl", seed=3, maxIter=10).fit(kl_df)
        assert kl_model.transform(kl_df).select("prediction").distinct().count() == 2
        print("KL fit ok")

        # --- save / load round trip ---
        tmp = tempfile.mkdtemp(prefix="graft-py-model-")
        try:
            path = os.path.join(tmp, "model")
            model.write().overwrite().save(path)
            loaded = GeneralizedKMeansModel.load(path)
            assert loaded.clusterCenters() == model.clusterCenters()
            assert loaded.getDivergence() == "squaredEuclidean"
            assert loaded.getDistanceCol() == "dist"
            re_pred = loaded.transform(df)
            assert (
                pred.select("features", "prediction").collect()
                == re_pred.select("features", "prediction").collect()
            )
            assert not loaded.hasSummary()
            print("save/load round-trip ok")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

        # --- param transfer fidelity ---
        est = GeneralizedKMeans(
            k=3, divergence="l1", assignmentStrategy="broadcast", maxIter=5
        )
        jm = est._to_java()
        assert jm.getK() == 3
        assert jm.getDivergence() == "l1"
        assert jm.getAssignmentStrategy() == "broadcast"
        assert jm.getMaxIter() == 5
        print("param transfer ok")

        # --- XMeans: BIC selection over [minK, maxK]. The reference's
        # Gaussian-BIC keeps improving slowly past the true k on dense
        # blobs (documented in VariantsSpec), so the hard guarantee is the
        # k range and that well-separated blobs are never merged.
        import random

        rnd = random.Random(42)
        blob_rows = [
            (Vectors.dense([cx + rnd.gauss(0, 0.3), cy + rnd.gauss(0, 0.3)]),)
            for cx, cy in [(0.0, 0.0), (10.0, 10.0)]
            for _ in range(25)
        ]
        blobs = spark.createDataFrame(blob_rows, ["features"])
        xm_model = XMeans(minK=2, maxK=4, seed=11, maxIter=10).fit(blobs)
        assert 2 <= xm_model.numClusters <= 4, xm_model.numClusters
        xm_pred = xm_model.transform(blobs)
        # no cluster may span both blobs: predictions within each blob's
        # 50-row half must be disjoint from the other half's
        halves = xm_pred.select("prediction").collect()
        left = {r[0] for r in halves[:25]}
        right = {r[0] for r in halves[25:]}
        assert left.isdisjoint(right), (left, right)
        print("XMeans ok: selected k =", xm_model.numClusters)

        # --- BisectingKMeans ---
        bi_model = BisectingKMeans(k=2, seed=5, maxIter=10).fit(df)
        assert bi_model.transform(df).select("prediction").distinct().count() == 2
        print("BisectingKMeans ok")

        # --- MiniBatchKMeans: reassignmentRatio param + step bridge ---
        mb_model = MiniBatchKMeans(
            k=2, seed=5, maxIter=8, batchSize=16, reassignmentRatio=0.01
        ).fit(df)
        assert mb_model.transform(df).select("prediction").distinct().count() == 2
        # one step at fixed state: the far-off center must die and move to
        # a batch point; the healthy center takes the closed-form merge
        state = spark.createDataFrame(
            [(0, [0.2, 0.2], 10.0), (1, [1000.0, 1000.0], 0.0)],
            ["cluster", "cv", "cnt"])
        arr_batch = spark.createDataFrame(
            [([0.0, 0.0],), ([0.2, 0.1],), ([9.9, 10.1],), ([10.0, 10.0],)],
            ["f"])
        stepped = minibatch_step(
            arr_batch, "f", "", state, "squaredEuclidean", 1e-10, 0.01,
        ).orderBy("cluster").collect()
        assert stepped[0]["cnt"] > 10.0
        assert stepped[1]["cnt"] == 1.0 and stepped[1]["cv"][0] < 100.0
        ms = mb_model.summary
        assert ms.reassignments is not None and ms.reassignments >= 0, \
            ms.reassignments
        print("MiniBatchKMeans + minibatch_step ok")

        # --- SoftKMeans: memberships column + hard predictions ---
        soft_model = SoftKMeans(k=2, beta=4.0, seed=9, maxIter=10).fit(df)
        soft_pred = soft_model.transform(df)
        assert "probability" in soft_pred.columns, soft_pred.columns
        probs = soft_pred.select("probability").first()[0]
        assert abs(sum(probs) - 1.0) < 1e-6, probs
        assert soft_pred.select("prediction").distinct().count() == 2
        print("SoftKMeans ok")

        # --- KMedoids / CLARA: medoids are actual data points ---
        pam_model = KMedoids(k=2, seed=13, maxIter=5).fit(df)
        meds = pam_model.medoids()
        rows = [list(r[0]) for r in df.collect()]
        assert all(m in rows for m in meds), meds
        assert pam_model.transform(df).select("prediction").distinct().count() == 2
        clara_model = CLARA(k=2, seed=13, numSamples=2, sampleSize=6).fit(df)
        assert len(clara_model.medoids()) == 2
        print("KMedoids/CLARA ok")

        # --- StreamingKMeans: batch init + mini-batch update ---
        skm_model = StreamingKMeans(k=2, seed=17, maxIter=5, decayFactor=0.5).fit(df)
        before = skm_model.currentCenters()
        shift = spark.createDataFrame(
            [(Vectors.dense([20.0, 20.0]),), (Vectors.dense([20.5, 19.5]),)],
            ["features"],
        )
        skm_model.update(shift)
        after = skm_model.currentCenters()
        assert before != after, "update did not move the centers"
        assert skm_model.transform(df).select("prediction").count() == 6
        print("StreamingKMeans ok: centers moved after update")

        # --- streaming model save/load across the graft.streaming module
        # (the JVM class lives in graft.streaming; the Python module path
        # must mirror it for JavaMLReadable to resolve the loader) ---
        tmp = tempfile.mkdtemp(prefix="graft-py-stream-")
        try:
            spath = os.path.join(tmp, "smodel")
            skm_model.write().overwrite().save(spath)
            sloaded = StreamingKMeansModel.load(spath)
            assert sloaded.currentCenters() == skm_model.currentCenters()
            assert sloaded.clusterWeights() == skm_model.clusterWeights()
            sloaded.update(shift)  # restored model keeps updating
            assert sloaded.currentCenters() != skm_model.currentCenters()
            print("streaming save/load ok")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

        # ---- data-pipeline ops (graft.ops) ----
        import graft.ops as gops
        from pyspark.sql import functions as F

        docs = spark.createDataFrame(
            [
                (0, "a b c d e f g h i j"),
                (1, "a b c d e f g h i j k"),  # near-dup of 0 (j ~ 0.889)
                (2, "z y x w v u t s r q"),
                (3, "a b c d e f g h i j"),   # exact dup of 0
            ],
            ["doc_id", "text"],
        )
        keep = gops.exact_keepers(docs, "doc_id", "text")
        assert sorted(r.doc_id for r in keep.collect()) == [0, 1, 2]
        pairs = gops.minhash_dedup(docs, "doc_id", "text", threshold=0.7)
        got_pairs = {(r.id_a, r.id_b) for r in pairs.collect()}
        assert (0, 1) in got_pairs and (0, 3) in got_pairs, got_pairs
        groups = gops.near_dup_groups(pairs, "id_a", "id_b")
        g = {r.comp: (r.keeper_id, r.group_size) for r in groups.collect()}
        assert g == {0: (0, 3)}, g
        pairs.unpersist()
        split = gops.leakage_safe_split(
            docs, "doc_id", "text", ["train", "test"], [0.5, 0.5])
        rows = {r.doc_id: (r.group_key, r.split) for r in split.collect()}
        assert rows[0][0] == 0 and rows[1][0] == 0 and rows[3][0] == 0
        assert rows[0][1] == rows[1][1] == rows[3][1], rows
        verdict = gops.ingest_verdict(
            docs.where("doc_id < 2"), docs.where("doc_id >= 2"), "doc_id", "text")
        v = {r.doc_id: r.dup_of for r in verdict.collect()}
        assert v[3] == 0 and v[2] is None, v
        verdict.unpersist()
        rules = gops.gopher_rules(docs, "doc_id", "text", min_words=5)
        # 10+ single-letter words: word count passes, mean word length
        # (1 < 3) correctly fails every doc — and therefore keep=false
        assert rules.where("word_count_ok").count() == 4
        assert rules.where("mean_len_ok or keep").count() == 0
        sp = gops.split_by_hash(docs, "doc_id", ["a", "b"], [0.5, 0.5])
        assert set(r.split for r in sp.collect()) <= {"a", "b"}
        scored = docs.select("doc_id", F.length("text").alias("score"))
        top = gops.select_top_by_score(scored, "doc_id", "score", 0.5)
        assert top.count() == 2
        top.unpersist()
        deco = gops.decontaminate(
            docs.where("doc_id != 0"), "doc_id", "text",
            docs.where("doc_id = 0"), "text", n=3, hash_shingles=False)
        d = {r.doc_id: r.contaminated for r in deco.collect()}
        assert d[1] and d[3] and not d[2], d
        ngrams = gops.frequent_ngrams(docs, "text", n=3, k=2).collect()
        assert ngrams[0].cnt >= 2, ngrams
        samp = gops.hash_sample(docs, "doc_id", 0.99, "s1")
        assert 1 <= samp.count() <= 4
        print("ops bindings ok")

        # round-13 additions: boilerplate cut, rank bucketing, CCNet
        # buckets, per-domain caps, trainable LR classifier
        boiler = gops.boilerplate_cut(docs, "doc_id", "text", n=3, min_df=3)
        assert boiler.count() == docs.count()
        assert "clean_text" in boiler.columns and "boiler_frac" in boiler.columns
        buck = gops.bucket_by_score(scored, "doc_id", "score", [1, 1], ["hi", "lo"])
        assert set(r.bucket for r in buck.collect()) <= {"hi", "lo"}
        assert buck.count() == docs.count()
        buck.unpersist()
        ppl = gops.perplexity_buckets(docs, "doc_id", "text")
        assert set(r.bucket for r in ppl.collect()) <= {"head", "middle", "tail"}
        ppl.unpersist()
        capped = gops.cap_per_domain(
            docs.withColumn("dom", F.lit("d0")), "dom", "doc_id", 2, "s")
        assert capped.count() == 2 and "rk" in capped.columns
        lab = docs.withColumn("y", (F.col("doc_id") % 2 == 0).cast("double"))
        w = gops.logistic_fit(lab, "doc_id", "text", "y", buckets=64, iters=2, lr=0.5)
        assert any(r.bucket == -1 for r in w.collect())  # intercept present
        sc = gops.logistic_score(docs, "doc_id", "text", w, buckets=64)
        assert sc.count() == docs.count()
        assert all(0.0 <= r.score <= 1.0 for r in sc.collect())
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        hn = gops.hard_negatives(
            emb, emb.where("vec_id < 3"), "vec_id", "embedding", "label", k=4)
        assert hn.count() == 12 and "neg_label" in hn.columns
        tp = gops.temperature_plan(
            docs.withColumn("w", F.lit(1)), "doc_id", "w", 2.0)
        assert tp.count() == 4 and abs(sum(r.rate for r in tp.collect()) - 4.0) < 1e-9
        tpd = gops.top_per_domain(
            docs.withColumn("dom", F.lit("d")).withColumn("s", F.col("doc_id") % 2),
            "dom", "doc_id", "s", 3)
        assert tpd.count() == 3
        dq = gops.domain_quota(
            docs.withColumn("dom", F.lit("d"))
                .withColumn("ts", F.to_timestamp(F.lit("2024-01-01"))),
            "ts", "dom", "doc_id", 2)
        assert dq.count() == 2
        rl = gops.rate_limit(
            docs.withColumn("dom", F.lit("d"))
                .withColumn("ts", F.to_timestamp(F.lit("2024-01-01"))),
            "ts", "dom", "doc_id", 3, window_seconds=60)
        assert rl.count() == 3 and "win_start_s" in rl.columns
        print("round-13 ops bindings ok")

        import graft.sources as gsrc
        ev = (docs.withColumn("uid", F.col("doc_id") % 3)
                  .withColumn("ts_ms", F.col("doc_id") * 1000))
        snaps = (ev.where("doc_id % 2 = 0")
                   .selectExpr("doc_id as snap_id", "uid", "ts_ms",
                               "doc_id as state"))
        aj = gops.asof_join(ev, snaps, "uid", "ts_ms", ["state"], "snap_id",
                            tolerance_ms=10_000_000)
        assert aj.count() == ev.count() and "asof_state" in aj.columns
        aj2 = gops.asof_join(ev, snaps, "uid", "ts_ms", ["state"], "snap_id")
        assert aj2.where("asof_ts is null").count() < ev.count()
        new_snap = docs.where("doc_id % 3 != 0")
        sd = gops.snapshot_diff(docs, new_snap, "doc_id", ["text"])
        assert set(r.status for r in sd.collect()) == {"removed", "unchanged"}
        st = gops.snapshot_diff_stats(docs, new_snap, "doc_id", ["text"])
        assert {r.status: r.n for r in st.collect()}["removed"] > 0
        co = gops.collocations(docs, "text", min_count=1, k=5)
        assert co.count() <= 5 and "pmi" in co.columns
        co.unpersist()
        sharded = gsrc.assign_shards(docs.withColumn("ntok", F.lit(1)), "doc_id", 4, "py")
        man = gsrc.shard_manifest(sharded, "doc_id", ["text"], "ntok")
        assert man.count() <= 4
        assert sum(r.n_rows for r in man.collect()) == docs.count()
        exp_dir = tempfile.mkdtemp(prefix="graft-py-shards")
        m2 = gsrc.write_shards(docs.withColumn("ntok", F.lit(1)), exp_dir,
                               "doc_id", ["text"], "ntok", 4, "py")
        assert m2.count() <= 4
        assert gsrc.read_shard(spark, exp_dir, 0).count() >= 0
        assert gsrc.verify_export(spark, exp_dir, "doc_id", ["text"], "ntok").count() == 0
        shutil.rmtree(exp_dir, ignore_errors=True)
        print("round-14 ops/sources bindings ok")

        al = gops.asof_lookup(ev, snaps, "uid", "ts_ms", "state", "snap_id",
                              tolerance_ms=10_000_000)
        assert al.count() == ev.count() and "asof_state" in al.columns
        tsd = gops.time_split(ev, "ts_ms", cutoff=1000, embargo=1000)
        labels = set(r.split for r in tsd.select("split").distinct().collect())
        assert labels == {"train", "embargo", "test"}
        sn = gops.sessionize_native(
            docs.withColumn("uid", F.col("doc_id") % 5)
                .withColumn("ts", F.to_timestamp(F.lit("2024-01-01"))),
            "uid", "ts", "doc_id", gap="10 minutes")
        assert sn.count() == 4  # 4 docs -> 4 distinct uids, one session each
        print("round-14 wave-2 bindings ok")

        sess = gops.sessionize_native(
            docs.withColumn("uid", F.col("doc_id") % 2)
                .withColumn("ts", F.to_timestamp(F.lit("2024-01-01"))),
            "uid", "ts", "doc_id", gap="10 minutes")
        ivls = sess.selectExpr("key as k", "startMs - 1 as lo", "endMs + 1 as hi",
                               "numEvents")
        pts = (docs.withColumn("k", F.col("doc_id") % 2)
                   .withColumn("ts", F.lit(1704067200000)))
        rj = gops.range_join(pts, ivls, "k", "ts", "lo", "hi", width_ms=3600000)
        assert rj.count() == docs.count() and "ivl_numEvents" in rj.columns
        ff = gops.fill_forward(snaps, "uid", "ts_ms", ["state"], "snap_id", step_ms=500)
        assert ff.count() > 0 and "asof_state" in ff.columns
        centers = spark.createDataFrame(
            [(0, [0.0, 0.0]), (1, [10.0, 10.0])], ["cluster", "centroid"])
        vecs = spark.createDataFrame(
            [(1, [0.1, 0.2]), (2, [9.9, 10.1]), (3, [0.3, 0.1])], ["vid", "v"])
        pr = gops.prototypicality(vecs, "vid", "v", centers)
        assert pr.count() == 3 and set(r.cluster for r in pr.collect()) == {0, 1}
        kept = gops.prune_prototypes(vecs, "vid", "v", centers, 1, 2)
        assert kept.count() == 2  # ceil(2/2) + ceil(1/2)
        cov = gops.pca_covariance(vecs, "v", 2)
        assert cov.count() == 3  # upper triangle of 2x2
        fi = gops.fill_interpolate(snaps, "uid", "ts_ms", "state", "snap_id",
                                   step_ms=500)
        assert fi.count() > 0 and "value" in fi.columns
        print("round-14 wave-3 bindings ok")

        # ---- round-15: evaluation-metrics bindings ----
        import graft.clustering as gc
        mdf = spark.createDataFrame(
            [([0.0, 0.1],), ([0.2, 0.0],), ([9.9, 10.0],), ([10.1, 9.8],)],
            ["features"])
        mm = gc.GeneralizedKMeans(k=2, seed=11, maxIter=5).fit(mdf)
        sil = gc.silhouette(mm, mdf, fraction=1.0)
        assert 0.5 < sil <= 1.0, f"silhouette {sil} out of range for clean blobs"
        ex_sil = gc.exact_silhouette(mm, mdf)
        assert 0.5 < ex_sil <= 1.0
        met = gc.clustering_metrics(mm, mdf).collect()[0]
        assert met.k == 2 and met.n_points == 4 and met.wcss >= 0.0
        sizes = {r.cluster: r.n for r in gc.cluster_sizes(mm, mdf).collect()}
        assert sum(sizes.values()) == 4
        ec = gc.elbow_curve(mdf, min_k=2, max_k=3, max_iter=5)
        assert [r.k for r in ec.orderBy("k").collect()] == [2, 3]
        cp = gops.chunk_passages(docs, "doc_id", "text", 8, 6)
        assert cp.count() >= docs.count() and "passage" in cp.columns
        assets = gops.assets_from_documents(docs)
        assert assets.columns == ["asset_id", "modality", "payload", "meta"]
        bd = gops.exact_binary_dedup(assets, "asset_id", "payload")
        assert bd.count() <= assets.count()
        refs = docs.selectExpr("doc_id as ref", "doc_id")
        orph = gops.orphan_refs(refs.limit(5), "ref", assets, "asset_id")
        assert orph.count() == 0
        feats = gops.extract_features(assets, "payload", "feat", 8, "meta")
        row = feats.select("feat").first()
        assert len(row.feat) == 8
        scored = docs.selectExpr("doc_id", "doc_id as score",
                                 "cast(doc_id % 2 = 0 as long) as y")
        cal = gops.calibration(scored, "doc_id", "score", "y", 4)
        assert cal.count() == 4 and "pos_rate_micro" in cal.columns
        print("round-15 metrics bindings ok")

        # parametric custom divergence registered BY NAME from Python:
        # beta=2 is squared Euclidean, so the fit must reproduce the SE
        # clustering exactly on clean blobs
        gc.register_beta_divergence(spark, "beta2smoke", 2.0)
        bm = gc.GeneralizedKMeans(
            k=2, seed=11, maxIter=5, divergence="beta2smoke").fit(mdf)
        bsizes = sorted(r.n for r in gc.cluster_sizes(bm, mdf).collect())
        assert bsizes == [2, 2], f"beta2 fit sizes {bsizes} != [2, 2]"
        gc.register_beta_divergence(spark, "beta15smoke", 1.5)
        b15 = gc.GeneralizedKMeans(
            k=2, seed=11, maxIter=5, divergence="beta15smoke").fit(mdf)
        assert b15.numClusters == 2
        print("parametric beta-divergence registration ok")

        # round-17 additions: exact-recall jaccard join, CMS sketch
        # layer, intra-doc chunk dedup
        jj = gops.jaccard_join(docs, "doc_id", "text", 50, 3)
        assert set(jj.columns) == {"id_a", "id_b", "jaccard"}
        assert jj.where("jaccard < 0.5").count() == 0
        jj.unpersist()
        from pyspark.sql import functions as F
        items = docs.selectExpr("explode(split(text, ' ')) AS k") \
            .where(F.col("k") != "")
        sk = gops.cms_build(items, "k", 3, 64, "pysmoke")
        assert sk.groupBy("r").count().count() <= 3
        est = gops.cms_estimate(sk, items, "k", 3, 64, "pysmoke")
        exact = items.groupBy("k").count()
        under = est.join(exact, "k").where("est < count").count()
        assert under == 0, "CMS under-estimated"
        hh = gops.cms_heavy_hitters(items, "k", 3, 64, "pysmoke", 10)
        heavy_exact = exact.where("count >= 10")
        missed = heavy_exact.join(hh, "k", "left_anti").count()
        assert missed == 0, "CMS heavy hitters missed a true heavy key"
        cd = gops.dedup_chunks_within(docs, "doc_id", "text", 2)
        assert cd.columns == [
            "doc_id", "clean_text", "n_chunks", "n_kept", "n_removed"]
        assert cd.where("n_kept + n_removed != n_chunks").count() == 0
        ca = spark.createDataFrame(
            [(1, "x x x x x y"), (2, "x x z")], ["doc_id", "text"])
        cb = spark.createDataFrame(
            [(3, "y y y y x z"), (4, "y y z")], ["doc_id", "text"])
        dr = gops.corpus_drift(ca, cb, "text", 2)
        assert dr.columns == ["token", "cnt_a", "cnt_b", "dir", "llr"]
        assert dr.where("llr < 0").count() == 0
        dirs = {r.token: r.dir for r in dr.collect()}
        assert dirs["x"] == 1 and dirs["y"] == -1
        print("round-17 sketch/setjoin/chunk-dedup/drift bindings ok")

        # round-18 additions: cross-corpus exact jaccard join, exact
        # heavy hitters (MG + CMS + exact confirm)
        ab = gops.jaccard_join_ab(
            docs.where("doc_id % 2 = 0"), docs.where("doc_id % 2 = 1"),
            "doc_id", "text", 50, 3)
        assert set(ab.columns) == {"id_a", "id_b", "jaccard"}
        assert ab.where("id_a % 2 != 0 OR id_b % 2 != 1").count() == 0
        ab.unpersist()
        hhx = gops.cms_heavy_hitters_exact(items, "k", 3, 64, "pysmoke", 10)
        got = {(r.k, r.cnt) for r in hhx.collect()}
        want = {(r.k, r["count"]) for r in heavy_exact.collect()}
        assert got == want, "exact heavy hitters != GROUP BY truth"
        # MG guarantee needs m >= N/threshold (same sizing as the auto path)
        m = items.count() // 10 + 1
        cand = gops.cms_local_top_candidates(items, "k", m)
        assert cand.columns == ["k"]
        missed2 = heavy_exact.join(cand, "k", "left_anti").count()
        assert missed2 == 0, "MG candidates missed a true heavy key"
        hhf = gops.cms_heavy_hitters_exact(
            items, "k", 3, 64, "pysmoke", 10, portable_hash=False)
        assert {(r.k, r.cnt) for r in hhf.collect()} == want, \
            "fast-hash exact heavy hitters != GROUP BY truth"
        tk = gops.cms_top_k_exact(items, "k", 10)
        got_tk = [(r.k, r.cnt) for r in sorted(tk.collect(), key=lambda r: r.rank)]
        want_tk = [(r.k, r["count"]) for r in sorted(
            exact.collect(), key=lambda r: (-r["count"], r.k))][:10]
        assert got_tk == want_tk, "top-k exact != ordered GROUP BY truth"
        tk.unpersist()
        sk_h = gops.CmsSketchHandle.build(items, "k", 3, 64, "pysmoke")
        sk_dir = tempfile.mkdtemp(prefix="cms_py")
        sk_h.write(sk_dir)
        sk_r = gops.CmsSketchHandle.read(spark, sk_dir)
        assert (sk_r.depth, sk_r.width, sk_r.seed) == (3, 64, "pysmoke")
        est_h = sk_r.estimate(items, "k")
        assert est_h.join(exact, "k").where("est < count").count() == 0
        try:
            sk_h.merge(gops.CmsSketchHandle.build(items, "k", 3, 64, "OTHER"))
            raise AssertionError("geometry mismatch not refused")
        except Exception as e:
            assert "geometry mismatch" in str(e)
        print("round-18 cross-corpus join / exact heavy hitters bindings ok")

        # round-19 additions: HLL distinct-count layer, exact quantiles
        regs = gops.hll_build(items, "k", 10, "pyhll")
        exact_distinct = items.distinct().count()
        est_c = gops.hll_estimate(regs, 10)
        assert abs(est_c - exact_distinct) <= max(3, 0.2 * exact_distinct), \
            f"HLL estimate {est_c} far from exact {exact_distinct}"
        merged = gops.hll_merge(
            gops.hll_build(items.limit(50), "k", 10, "pyhll"),
            gops.hll_build(items, "k", 10, "pyhll"))
        assert merged.exceptAll(regs).count() == 0 \
            and regs.exceptAll(merged).count() == 0 \
            and merged.count() == regs.count(), "merge(subset, full) != full"
        gr = gops.hll_build_grouped(
            docs.selectExpr("doc_id % 3 AS grp",
                            "explode(split(text, ' ')) AS k")
                .where(F.col("k") != ""), ["grp"], "k", 10, "pyhll")
        ge = gops.hll_estimate_grouped(gr, ["grp"], 10)
        assert ge.columns == ["grp", "est"] and ge.count() == 3
        hsk = gops.HllSketchHandle.build(items, "k", 10, "pyhll")
        hll_dir = tempfile.mkdtemp(prefix="hll_py")
        hsk.write(hll_dir)
        hsk_r = gops.HllSketchHandle.read(spark, hll_dir)
        assert (hsk_r.p, hsk_r.seed) == (10, "pyhll")
        assert hsk_r.estimate() == est_c
        try:
            hsk.merge(gops.HllSketchHandle.build(items, "k", 10, "OTHER"))
            raise AssertionError("HLL geometry mismatch not refused")
        except Exception as e:
            assert "geometry mismatch" in str(e)
        lens = docs.selectExpr("length(text) AS n_chars")
        qp = gops.quantiles_exact_pct(lens, "n_chars", [5, 50, 95])
        assert qp.columns == ["pct", "k", "value"]
        truth = sorted(r.n_chars for r in
                       lens.where("n_chars IS NOT NULL").collect())
        n = len(truth)
        for r in qp.collect():
            assert r.value == truth[(r.pct * n + 99) // 100 - 1], \
                f"pct {r.pct}: {r.value} != ground truth"
        qr = gops.quantiles_at_ranks(lens, "n_chars", [1, n])
        got_q = {r.k: r.value for r in qr.collect()}
        assert got_q == {1: truth[0], n: truth[-1]}
        u = gops.hll_union_estimate(regs, regs, 10)
        assert u == est_c, "union(A, A) must equal est(A) (lossless merge)"
        ix = gops.hll_intersect_estimate(regs, regs, 10)
        assert ix == est_c, "intersect(A, A) must equal est(A)"
        qw = gops.quantiles_exact_pct_weighted(
            lens.selectExpr("n_chars AS v", "1 AS w"), "v", "w", [50])
        assert qw.collect()[0].value == truth[(50 * n + 99) // 100 - 1], \
            "unit-weighted quantile != unweighted truth"
        pf = gops.percentile_filter(lens, "n_chars", 10, 90)
        lo_c = truth[(10 * n + 99) // 100 - 1]
        hi_c = truth[(90 * n + 99) // 100 - 1]
        assert pf.count() == sum(1 for v in truth if lo_c <= v <= hi_c)
        qg = gops.quantiles_exact_pct_by_group(
            docs.selectExpr("doc_id % 2 AS grp", "length(text) AS v"),
            ["grp"], "v", [50])
        assert qg.columns == ["grp", "pct", "k", "value"] and qg.count() == 2
        qd = gops.quantiles_exact_pct_double(
            lens.selectExpr("CAST(n_chars * 0.5 AS DOUBLE) AS v"), "v", [50])
        assert qd.collect()[0].value == truth[(50 * n + 99) // 100 - 1] * 0.5
        print("round-19 hll/quantiles bindings ok")

        # round-20 additions: double quantile variants, grouped HLL
        # overlap, the rank sketch handle, and the new type guards
        dvals = docs.selectExpr("doc_id",
                                "CAST(length(text) * 0.5 AS DOUBLE) AS v")
        qgd = gops.quantiles_exact_pct_by_group_double(
            dvals.selectExpr("doc_id % 2 AS grp", "v"), ["grp"], "v", [50])
        assert qgd.columns == ["grp", "pct", "k", "value"] and qgd.count() == 2
        pfd = gops.percentile_filter_double(dvals, "v", 10, 90)
        assert pfd.count() == pf.count(), \
            "double band over 0.5-scaled lengths must keep the same rows " \
            "(monotone transform preserves ranks)"
        try:
            gops.quantiles_exact_pct(dvals, "v", [50])
            raise AssertionError("fractional column not refused")
        except Exception as e:
            assert "exactPctDouble" in str(e)
        ug = gops.hll_union_estimate_grouped(gr, gr, ["grp"], 10)
        ig = gops.hll_intersect_estimate_grouped(gr, gr, ["grp"], 10)
        ge_map = {r.grp: r.est for r in ge.collect()}
        assert {r.grp: r.est for r in ug.collect()} == ge_map, \
            "union(A, A) per group must equal est(A)"
        assert {r.grp: r.est for r in ig.collect()} == ge_map, \
            "intersect(A, A) per group must equal est(A)"
        # r22: grouped sufficient-statistics views (rint(raw est) must
        # equal the integer estimator; A-vs-A overlap stats are symmetric)
        gs = gops.hll_estimate_grouped_stats(gr, ["grp"], 10)
        for r in gs.collect():
            assert abs(r.est - ge_map[r.grp]) <= 0.5000001, \
                f"raw est {r.est} not within rint of {ge_map[r.grp]}"
            assert r.touched > 0 and int(r.sumscaled) > 0
        igs = gops.hll_intersect_estimate_grouped_stats(gr, gr, ["grp"], 10)
        for r in igs.collect():
            assert r.t_a == r.t_b == r.t_u and r.s_a == r.s_b == r.s_u
        print("round-22 hll grouped-stats bindings ok")
        qsk = gops.QuantileSketchHandle.build(
            docs.selectExpr("doc_id", "length(text) AS v")
                .where("v IS NOT NULL"), "doc_id", "v", 4096, "pyqsk")
        assert qsk.n == n and not qsk.double_valued
        # n <= s here, so the sketch is exact
        assert qsk.quantile(50) == truth[(50 * n + 99) // 100 - 1]
        assert qsk.rank_of(truth[-1]) == n
        qsk_dir = tempfile.mkdtemp(prefix="qsk_py")
        qsk.write(qsk_dir)
        qsk_r = gops.QuantileSketchHandle.read(spark, qsk_dir)
        assert (qsk_r.s, qsk_r.seed, qsk_r.n) == (4096, "pyqsk", n)
        assert qsk_r.quantile(50) == qsk.quantile(50)
        merged_q = qsk.merge(qsk_r)  # NOT disjoint, but geometry-legal:
        assert merged_q.n == 2 * n   # n adds; structure stays a summary
        try:
            qsk.merge(gops.QuantileSketchHandle.build(
                docs.selectExpr("doc_id", "length(text) AS v"),
                "doc_id", "v", 4096, "OTHER"))
            raise AssertionError("rank-sketch geometry mismatch not refused")
        except Exception as e:
            assert "geometry mismatch" in str(e)
        qskd = gops.QuantileSketchHandle.build_double(
            dvals, "doc_id", "v", 4096, "pyqsk")
        assert qskd.quantile_double(50) == truth[(50 * n + 99) // 100 - 1] * 0.5
        print("round-20 double-quantile/overlap/rank-sketch bindings ok")

        # round-20 wave 2: grouped rank sketch + streaming windowed sketch
        # (over the real parquet tables: the local `docs` frame has no
        # lang column)
        gdocs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet") \
            .selectExpr("doc_id", "lang", "CAST(n_chars AS BIGINT) AS v") \
            .where("doc_id IS NOT NULL AND v IS NOT NULL")
        gn = gdocs.count()
        gq = gops.GroupedQuantileSketchHandle.build_grouped(
            gdocs, ["lang"], "doc_id", "v", 64, "pygq")
        assert gq.summary.columns == ["lang", "rk", "value"]
        assert gq.counts.groupBy().sum("n").collect()[0][0] == gn
        gq50 = gq.quantiles([50])
        assert gq50.columns == ["lang", "pct", "k", "value"]
        # per-group p50 must be a real element of that group's values
        pairs = gdocs.select("lang", "v").collect()
        by_lang = {}
        for r in pairs:
            by_lang.setdefault(r.lang, []).append(r.v)
        for r in gq50.collect():
            assert r.value in by_lang[r.lang]
        ro = gq.rank_of(10**9)  # everything is below this threshold
        assert {x.lang: x.le_est for x in ro.collect()} == \
            {lang: len(vs) for lang, vs in by_lang.items()}
        gq_dir = tempfile.mkdtemp(prefix="gq_py")
        gq.write(gq_dir)
        gq_r = gops.GroupedQuantileSketchHandle.read(spark, gq_dir)
        assert (gq_r.s, gq_r.seed, gq_r.double_valued) == (64, "pygq", False)
        merged_g = gq.merge(gq_r)
        assert merged_g.counts.groupBy().sum("n").collect()[0][0] == 2 * gn
        try:
            gq.merge(gops.GroupedQuantileSketchHandle.build_grouped(
                gdocs, ["lang"], "doc_id", "v", 64, "OTHER"))
            raise AssertionError("grouped geometry mismatch not refused")
        except Exception as e:
            assert "geometry mismatch" in str(e)
        ws = gops.stream_rank_sketch_windowed(
            spark.read.parquet("/root/testdata/sf0.001/events.parquet")
                .selectExpr("event_id", "ts", "user_id AS v")
                .where("ts IS NOT NULL"),
            "ts", "event_id", "v", "1 day", "1 hour", 16, "pyws")
        assert ws.columns == ["windowStartMs", "windowEndMs", "rk",
                              "value", "n", "portable"]
        assert ws.groupBy("windowStartMs").count() \
            .where("count > 16").count() == 0
        # rebuild the grouped-sketch surface from the emitted rows
        gq_ws = gops.GroupedQuantileSketchHandle.from_window_summaries(
            ws, 16, "pyws")
        assert gq_ws.quantiles([50]).count() == \
            ws.select("windowStartMs").distinct().count()
        wsg = gops.stream_rank_sketch_windowed_by_group(
            spark.read.parquet("/root/testdata/sf0.001/events.parquet")
                .selectExpr("event_id", "ts", "event_type", "user_id AS v")
                .where("ts IS NOT NULL"),
            "ts", "event_type", "event_id", "v", "1 day", "1 hour",
            16, "pywsg")
        assert wsg.columns == ["windowStartMs", "windowEndMs", "group",
                               "rk", "value", "n", "portable"]
        gq_wsg = gops.GroupedQuantileSketchHandle.from_window_group_summaries(
            wsg, 16, "pywsg")
        assert gq_wsg.quantiles([50]).count() == \
            wsg.select("windowStartMs", "group").distinct().count()
        # exact rollups: (window, group) -> group, and -> global
        rolled = gq_wsg.regroup(["group"], ["group"])
        assert rolled.quantiles([50]).count() == \
            wsg.select("group").distinct().count()
        glob = gq_wsg.to_global()
        total = wsg.select("windowStartMs", "group", "n").distinct() \
            .groupBy().sum("n").collect()[0][0]
        assert glob.n == total
        assert glob.quantile(50) > 0
        wsd = gops.stream_rank_sketch_windowed_double(
            spark.read.parquet("/root/testdata/sf0.001/events.parquet")
                .selectExpr("event_id", "ts", "value")
                .where("ts IS NOT NULL"),
            "ts", "event_id", "value", "1 day", "1 hour", 16, "pywsd")
        assert dict(wsd.dtypes)["value"] == "double"
        assert wsd.where("isnan(value)").count() == 0
        print("round-20 grouped/streaming rank-sketch bindings ok")

        # round-20 wave 6: Bloom membership word frames + geometry-safe handle
        bw = gops.bloom_build(items, "k", 4096, 3)
        assert set(c for c, _ in bw.dtypes) == {"w", "bits"}
        assert bw.count() <= 64
        bm = gops.bloom_merge(
            gops.bloom_build(items.limit(50), "k", 4096, 3), bw)
        verd = gops.bloom_might_contain(bm, items, "k", 4096, 3)
        assert verd.where("NOT contained").count() == 0  # no false negatives
        assert 0.0 < gops.bloom_fill_ratio(bw, 4096) < 1.0
        gb = gops.bloom_build_grouped(
            items.withColumn("grp", F.length("k") % 2), "k", ["grp"], 4096, 3)
        assert gops.bloom_merge_grouped(gb, gb, ["grp"]).count() == gb.count()
        gv = gops.bloom_might_contain_grouped(
            gb, items.withColumn("grp", F.length("k") % 2), "k", ["grp"],
            4096, 3)
        assert gv.where("NOT contained").count() == 0  # members of own group
        gbs = gops.GroupedBloomSketchHandle.build(
            items.withColumn("grp", F.length("k") % 2), "k", ["grp"], 4096, 3)
        assert gbs.group_cols == ["grp"]
        assert gbs.fill_ratios().count() == gbs.words.select("grp").distinct().count()
        glob = gbs.to_global()
        assert glob.might_contain(items, "k").where("NOT contained").count() == 0
        one = gbs.regroup(["bucket"], ["grp % 1"])  # computed coarse group
        assert one.words.select("bucket").distinct().count() == 1
        gb_dir = tempfile.mkdtemp(prefix="gbloom_py")
        gbs.write(gb_dir + "/f")
        gbs2 = gops.GroupedBloomSketchHandle.read(spark, gb_dir + "/f")
        assert gbs2.num_bits == 4096 and gbs2.group_cols == ["grp"]
        ww = gops.stream_bloom_windowed_words(
            spark.read.parquet("/root/testdata/sf0.001/events.parquet")
                .selectExpr("ts", "CAST(event_id AS STRING) AS k")
                .where("ts IS NOT NULL"),
            "ts", "k", "1 day", "1 hour", 4096, 3)
        assert set(c for c, _ in ww.dtypes) == \
            {"windowStartMs", "windowEndMs", "w", "bits", "portable"}
        wwh = gops.stream_bloom_from_window_words(ww, 4096, 3)
        assert wwh.to_global().might_contain(
            spark.createDataFrame([("1",)], ["k"]), "k").count() == 1
        gc = gops.cms_build_grouped(
            items.withColumn("grp", F.length("k") % 2), "k", ["grp"],
            3, 64, "pygcms")
        ge2 = gops.cms_estimate_grouped(
            gc, items.withColumn("grp", F.length("k") % 2), "k", ["grp"],
            3, 64, "pygcms")
        exact2 = items.withColumn("grp", F.length("k") % 2) \
            .groupBy("grp", "k").count()
        assert ge2.join(exact2, ["grp", "k"]).where("est < count").count() == 0
        assert gops.cms_merge_grouped(gc, gc, ["grp"]).count() == gc.count()
        gch = gops.GroupedCmsSketchHandle.build(
            items.withColumn("grp", F.length("k") % 2), "k", ["grp"],
            3, 64, "pygcmsh")
        gcms_dir = tempfile.mkdtemp(prefix="gcms_py")
        gch.write(gcms_dir + "/f")
        gch2 = gops.GroupedCmsSketchHandle.read(spark, gcms_dir + "/f")
        assert gch2.group_cols == ["grp"]
        assert gch2.estimates(
            items.withColumn("grp", F.length("k") % 2), "k").count() > 0
        ghh = gops.GroupedHllSketchHandle.build(
            items.withColumn("grp", F.length("k") % 2), "k", ["grp"],
            9, "pyghll")
        ghll_dir = tempfile.mkdtemp(prefix="ghll_py")
        ghh.write(ghll_dir + "/f")
        ghh2 = gops.GroupedHllSketchHandle.read(spark, ghll_dir + "/f")
        assert ghh2.p == 9 and ghh2.group_cols == ["grp"]
        ests = {r[0]: r[1] for r in ghh2.estimates().collect()}
        assert all(v > 0 for v in ests.values())
        ue = ghh2.union_estimates(ghh)  # self-union == self-estimate
        assert {r[0]: r[1] for r in ue.collect()} == ests
        # exact rollups across the grouped handles + windowed builds
        assert ghh2.regroup(["one"], ["0"]).estimates().count() == 1
        assert ghh2.to_global().estimate() > 0
        assert gch2.to_global().estimate(items, "k").count() > 0
        ev_src = spark.read.parquet(
            "/root/testdata/sf0.001/events.parquet") \
            .selectExpr("ts", "CAST(event_id AS STRING) AS k") \
            .where("ts IS NOT NULL")
        hw = gops.stream_hll_windowed_registers(
            ev_src, "ts", "k", "1 day", "1 hour", 9, "pywhll")
        hwh = gops.stream_hll_from_window_registers(hw, 9, "pywhll")
        assert hwh.to_global().estimate() > 0
        cw = gops.stream_cms_windowed_cells(
            ev_src, "ts", "k", "1 day", "1 hour", 3, 64, "pywcms")
        cwh = gops.stream_cms_from_window_cells(cw, 3, 64, "pywcms")
        assert cwh.to_global().estimate(
            ev_src.select("k"), "k").where("est <= 0").count() == 0
        # (window x group) strata through the gateway
        ev_g = ev_src.withColumn("grp", F.length("k") % 2)
        wwg = gops.stream_bloom_windowed_words(
            ev_g, "ts", "k", "1 day", "1 hour", 4096, 3, group_cols=["grp"])
        assert "grp" in [c for c, _ in wwg.dtypes]
        wgh = gops.stream_bloom_from_window_words(
            wwg, 4096, 3, group_cols=["grp"])
        assert wgh.group_cols == ["windowStartMs", "windowEndMs", "grp"]
        bsk = gops.BloomSketchHandle.build(items, "k", 4096, 3)
        bloom_dir = tempfile.mkdtemp(prefix="bloom_py")
        bsk.write(bloom_dir + "/f")
        bsk2 = gops.BloomSketchHandle.read(spark, bloom_dir + "/f")
        assert bsk2.num_bits == 4096 and bsk2.num_hashes == 3
        assert bsk2.might_contain(items, "k").where("NOT contained").count() == 0
        assert bsk2.fpr_estimate() < 1.0
        print("round-20 bloom membership bindings ok")

        # round-21: fast-hash mode, sizeFor, incremental semantic dedup
        nb, nh = gops.bloom_size_for(spark, 100000, 0.01)
        assert nb % 64 == 0 and 1 <= nh <= 16
        cb, ch = gops.bloom_size_for_corpus(items, "k", 0.01)
        assert cb % 64 == 0 and 1 <= ch <= 16
        fb = gops.BloomSketchHandle.build(items, "k", 4096, 3,
                                          portable_hash=False)
        assert fb.portable_hash is False
        assert fb.might_contain(items, "k").where("NOT contained").count() == 0
        try:
            fb.merge(bsk)
            raise AssertionError("cross-mode merge must refuse")
        except Exception as e:
            assert "geometry mismatch" in str(e)
        fq = gops.QuantileSketchHandle.build(
            docs.selectExpr("doc_id", "length(text) AS v"), "doc_id", "v",
            128, "pyfq", portable_hash=False)
        assert fq.portable_hash is False and fq.quantile(50) > 0
        fww = gops.stream_bloom_windowed_words(
            ev_src, "ts", "k", "1 day", "1 hour", 4096, 3,
            portable_hash=False)
        fwh = gops.stream_bloom_from_window_words(
            fww, 4096, 3, portable_hash=False)
        assert fwh.portable_hash is False
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        cdf = emb.where("vec_id < 8").selectExpr(
            "vec_id AS cluster", "CAST(embedding AS ARRAY<DOUBLE>) AS cv")
        bverd, sidx = gops.SemDedupIndexHandle.build(
            emb.where("vec_id % 7 != 0"), "vec_id", "embedding", cdf, 0.3)
        assert bverd.count() > 0 and sidx.epsilon == 0.3
        pv = sidx.probe(emb.where("vec_id % 7 = 0"), "vec_id", "embedding")
        assert set(c for c, _ in pv.dtypes) == {
            "id", "cluster", "centroid_sim", "dup_of", "n_dup_matches", "keep"}
        iv, sidx2 = sidx.ingest(
            emb.where("vec_id % 7 = 0"), "vec_id", "embedding")
        kept2 = iv.where("keep").count()
        assert sidx2.keepers.count() == sidx.keepers.count() + kept2
        sem_dir = tempfile.mkdtemp(prefix="semidx_py")
        sidx.write(sem_dir + "/f")
        sidx_r = gops.SemDedupIndexHandle.read(spark, sem_dir + "/f")
        assert sidx_r.keepers.count() == sidx.keepers.count()
        hrow = sidx_r.health().collect()[0]
        assert hrow["n_keepers"] == sidx.keepers.count() and hrow["k"] == 8
        tv, tidx = gops.SemDedupIndexHandle.train(
            emb.where("vec_id % 7 != 0"), "vec_id", "embedding",
            k=8, epsilon=0.3, seed=7)
        assert tidx.keepers.count() == tv.where("keep").count()
        print("round-21 fast-hash + incremental semdedup bindings ok")

        # r19: partition-scoped write-back — verdicts equal the
        # in-memory ingest's, store grows by exactly the novel docs
        pv2 = gops.SemDedupIndexHandle.ingest_into(
            spark, sem_dir + "/f", emb.where("vec_id % 7 = 0"),
            "vec_id", "embedding")
        assert pv2.count() == iv.count()
        assert (pv2.where("keep").count() == kept2)
        sidx_r2 = gops.SemDedupIndexHandle.read(spark, sem_dir + "/f")
        assert sidx_r2.keepers.count() == sidx.keepers.count() + kept2
        pv2.unpersist()
        # healthy store: repair is a no-op (0 changed digests)
        assert gops.SemDedupIndexHandle.repair_manifest(
            spark, sem_dir + "/f") == 0
        print("round-19 partition-scoped semdedup ingest binding ok")

        # r22: maintenance rebalance — keeper set preserved, partitioning
        # refreshed (fixed-centers and trained one-call forms)
        before_ids = {r["id"] for r in sidx.keepers.select("id").collect()}
        ridx = sidx.rebalance_to(cdf)
        assert {r["id"] for r in ridx.keepers.select("id").collect()} \
            == before_ids
        ridx2 = sidx.rebalance(k=4, seed=7)
        assert {r["id"] for r in ridx2.keepers.select("id").collect()} \
            == before_ids
        assert ridx2.health().collect()[0]["k"] == 4
        print("round-22 semdedup rebalance bindings ok")

        # r22: ANN index handle — deterministic fixed-quantizer build,
        # cell-pruned search vs exact brute force, health, write/append/
        # load/retrain loop
        bf = gops.brute_force_top_k(emb, emb.where("vec_id < 4"),
                                    "vec_id", "embedding", k=3)
        assert bf.groupBy("query_id").count().collect()[0]["count"] == 3
        ivf = gops.IvfIndexHandle.build_with_centers(
            emb, "vec_id", "embedding", cdf)
        full = ivf.search(emb.where("vec_id < 4"), "vec_id", "embedding",
                          k=3, n_probe=8)
        bf_set = {(r["query_id"], r["corpus_id"]) for r in bf.collect()}
        full_set = {(r["query_id"], r["corpus_id"]) for r in full.collect()}
        assert full_set == bf_set, "all-cells IVF != brute force"
        h = ivf.health().collect()[0]
        assert h["n_cells"] == 8 and h["n_vectors"] == emb.count()
        ivf_dir = tempfile.mkdtemp(prefix="ivf_py") + "/idx"
        ivf.write(ivf_dir)
        n_app = gops.IvfIndexHandle.append(
            spark, ivf_dir,
            emb.selectExpr("vec_id + 1000000 AS vec_id", "embedding"),
            "vec_id", "embedding")
        assert n_app == emb.count()
        grown = gops.IvfIndexHandle.load(spark, ivf_dir)
        assert grown.cells.count() == 2 * emb.count()
        ret = gops.IvfIndexHandle.retrain(spark, ivf_dir, max_iter=3)
        assert (ret.health().collect()[0]["n_cells"]
                == ret.health().collect()[0]["recommended_cells"])
        # r19: recall-vs-nProbe curve + target-driven probe sizing
        curve = ivf.recall_curve(k=3, sample_n=32, seed=5).collect()
        assert len(curve) == 8 and curve[-1]["recall"] == 1.0
        p9 = ivf.probe_for(0.9, k=3, sample_n=32, seed=5)
        assert 1 <= p9 <= 8
        assert [r["recall"] for r in curve][p9 - 1] >= 0.9
        print("round-19 recall-curve/probe-for bindings ok")
        print("round-22 ANN index bindings ok")

        # r22: IVF-PQ handle — build/search/rerank/append/health/retrain
        pq = gops.IvfPqIndexHandle.build(
            emb, "vec_id", "embedding", n_cells=4, m=4, ksub=16,
            max_iter=4, seed=5)
        pr = pq.search_rerank(emb.where("vec_id < 3"), "vec_id",
                              "embedding", emb, k=3, n_probe=4)
        assert pr.groupBy("query_id").count().collect()[0]["count"] == 3
        pq_dir = tempfile.mkdtemp(prefix="pq_py") + "/idx"
        pq.write(pq_dir)
        assert gops.IvfPqIndexHandle.append(
            spark, pq_dir,
            emb.selectExpr("vec_id + 1000000 AS vec_id", "embedding"),
            "vec_id", "embedding") == emb.count()
        ph = gops.IvfPqIndexHandle.load(spark, pq_dir).health().collect()[0]
        assert ph["n_vectors"] == 2 * emb.count() and ph["n_cells"] == 4
        emb2 = emb.selectExpr("vec_id", "embedding")
        pret = gops.IvfPqIndexHandle.retrain(
            spark, pq_dir,
            emb2.unionByName(
                emb2.selectExpr("vec_id + 1000000 AS vec_id", "embedding")),
            "vec_id", "embedding", max_iter=3)
        assert (pret.health().collect()[0]["n_cells"]
                == pret.health().collect()[0]["recommended_cells"])
        print("round-22 IVF-PQ bindings ok")

        # r19: crash-window compact + measured PQ recall curve/probe
        dup_removed = gops.IvfPqIndexHandle.compact(spark, pq_dir)
        assert dup_removed == 0  # clean store: nothing to repair
        gops.IvfPqIndexHandle.append(
            spark, pq_dir, emb2.selectExpr("vec_id", "embedding"),
            "vec_id", "embedding")
        assert gops.IvfPqIndexHandle.compact(spark, pq_dir) == emb.count()
        pq_curve = pq.recall_curve(emb, "vec_id", "embedding", k=3,
                                   n_probes=[1, 2, 4], rerank_k=32,
                                   sample_n=16, seed=3).collect()
        assert [r["nProbe"] for r in pq_curve] == [1, 2, 4]
        recalls = [r["recall"] for r in pq_curve]
        assert all(a <= b + 1e-12 for a, b in zip(recalls, recalls[1:]))
        p_ok = pq.probe_for(emb, "vec_id", "embedding", 0.5, k=3,
                            n_probes=[1, 2, 4], rerank_k=32,
                            sample_n=16, seed=3)
        assert p_ok == -1 or p_ok in (1, 2, 4)
        pq.unpersist()
        print("round-19 PQ compact/recall bindings ok")

        print("SMOKE TEST PASSED")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
