"""Stage-level timing probe for the graph driver-tier keys (r14):
where do graph_adamic_adar / graph_link_prediction spend their
seconds — the multiprobe pair generator, the edge collect, the Python
wedge loop, or the createDataFrame seam?

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python plans/r14/probe_graph.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from dht11_data_pipeline_spark.session import get_spark  # noqa: E402
from dht11_data_pipeline_spark.operators import graph, similarity  # noqa: E402
from dht11_data_pipeline_spark.plans.ext_queries import load_table  # noqa: E402


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label:45s} {dt:8.3f}s")
    return out


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe-graph")
    emb = load_table(spark, sf_dir, "embeddings")

    # warm the scan
    emb.count()

    # stage 1: multiprobe pair generation (the shared edge generator)
    pairs = similarity.embedding_near_duplicates_multiprobe(
        emb, threshold=0.25)
    t("multiprobe pairs noop", lambda: pairs.write.format("noop")
      .mode("overwrite").save())

    # stage 2: canonicalize + persist + count + toPandas (the collect)
    pairs2 = similarity.embedding_near_duplicates_multiprobe(
        emb, threshold=0.25)
    und = graph._canonical_edges(pairs2, "id_a", "id_b", True).persist()
    n = t("canonical persist+count", lambda: und.count())
    print(f"  n_edges = {n}")
    pdf = t("toPandas edge collect", lambda: und.toPandas())
    edge_rows = t("zip to tuples", lambda: list(
        zip(pdf["x"].tolist(), pdf["y"].tolist())))
    und.unpersist()

    # stage 3: the Python wedge loop, both flavors
    adj = t("_adjacency build", lambda: graph._adjacency(edge_rows))
    deg = {x: len(adj[x]) for x in adj}
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    print(f"  n_nodes = {len(adj)}, wedge volume = {wedges}")
    pdf_aa = t("_pair_similarity_driver aa", lambda:
               graph._pair_similarity_driver(edge_rows, graph.MAX_CENTER_DEGREE,
                                             aa_weights=True))
    pdf_jc = t("_pair_similarity_driver jaccard", lambda:
               graph._pair_similarity_driver(edge_rows, graph.MAX_CENTER_DEGREE,
                                             aa_weights=False))
    print(f"  n_pairs aa = {len(pdf_aa)}, jc = {len(pdf_jc)}")

    # stage 4: the createDataFrame seam
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("id_a", T.LongType(), False),
        T.StructField("id_b", T.LongType(), False),
        T.StructField("n_common", T.LongType(), False),
        T.StructField("aa_ppm", T.LongType(), False),
        T.StructField("is_edge", T.StringType(), False)])
    pdf_aa.columns = ["id_a", "id_b", "n_common", "aa_ppm", "is_edge"]
    df = t("createDataFrame", lambda: spark.createDataFrame(pdf_aa, schema))
    t("result noop", lambda: df.write.format("noop").mode("overwrite").save())

    # end-to-end reference
    for name in ("graph_adamic_adar", "graph_link_prediction",
                 "graph_triangle_count", "graph_degree_assortativity",
                 "graph_clustering_coeff", "graph_kcore", "graph_pagerank"):
        from dht11_data_pipeline_spark.plans import ext_queries as X
        fn = getattr(X, name)
        t(f"e2e {name}", lambda: fn(spark, sf_dir).write.format("noop")
          .mode("overwrite").save())


if __name__ == "__main__":
    main()
