"""Product quantization (PQ) for embedding similarity at scale.

The third ANN tier next to LSH (similarity.lsh_ann_topk) and IVF
(similarity.ivf_topk): compress each d-dim vector into m byte codes
(one per subspace) against per-subspace codebooks, then score queries
against the *codes* via asymmetric distance computation (ADC) — a
table lookup per subspace instead of a d-dim dot product. At 100 TB
this is the difference between scanning 256 GB of codes and 25 TB of
raw float32 vectors for an exhaustive scan, and it composes with IVF
(IVF-PQ) by storing codes in the inverted lists.

Dataflow (all deterministic):
  train  : explode vectors into (id, sub_idx, subvec) rows → Lloyd
           rounds for ALL m subspaces in one job per iteration
           (assignment = mapInPandas with the m codebooks in closure;
           update = posexplode dims → mean per (sub, code, dim)).
           Codebooks are k·m·(d/m) floats — driver/broadcast scale.
  encode : one Arrow-batched pass: argmin subvector → code per
           subspace; output (id, codes array<int>).
  probe  : queries are the small side (collected like centroids);
           per Arrow batch of codes, ADC = numpy gather over the
           per-query lookup tables; top-k per query by window.

Cosine via ADC: dot(q,x) ≈ Σ_m dot(q_m, c[x_m]) and |x| ≈
sqrt(Σ_m |c[x_m]|²) — both pure code lookups; |q| is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dht11_data_pipeline_spark.functions.partitioning import right_size

Codebooks = dict[int, list[tuple[int, list[float]]]]  # sub_idx -> [(code, subvec)]


def _check_divisible(corpus: DataFrame, m: int, vec_col: str) -> None:
    """Fail fast when the embedding width is not divisible by m:
    truncated subdim would silently drop the trailing d % m dimensions
    from encoding and from the ADC tables (recall degrades unsignaled).
    One limit-1 probe — driver metadata scale."""
    row = corpus.select(F.size(vec_col).alias("d")).first()
    if row is not None and row["d"] is not None and row["d"] % m != 0:
        raise ValueError(
            f"vector length {row['d']} not divisible by m={m}; "
            "pick m dividing the embedding width")


def _subvector_rows(corpus: DataFrame, m: int, id_col: str,
                    vec_col: str) -> DataFrame:
    """(id, sub_idx, subvec): the vector cut into m equal slices."""
    d = F.size(vec_col)
    sub = F.posexplode(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda s: F.slice(F.col(vec_col), s * (d / m).cast("int") + 1,
                              (d / m).cast("int")),
        )
    )
    return right_size(corpus).select(F.col(id_col), sub.alias("sub_idx", "subvec"))


def _assign_codes(subrows: DataFrame, codebooks: Codebooks, id_col: str,
                  keep_subvec: bool = False) -> DataFrame:
    """(id, sub_idx, code, sq_dist[, subvec]): nearest code per
    subspace row. One vectorized pass — the codebook matrices ride the
    task closure. ``keep_subvec`` carries the subvector through so the
    training update needs no join back to the input (an N·m-row
    shuffle saved per Lloyd round)."""
    import numpy as np

    if not codebooks:
        raise ValueError("empty codebooks: training seed selected no vectors "
                         "(empty corpus, or no id % code_mod == 0 rows?)")
    want = set(range(max(codebooks) + 1))
    if set(codebooks) != want or any(not cb for cb in codebooks.values()):
        raise ValueError(
            f"codebooks must cover every subspace 0..{max(codebooks)}; "
            f"got non-empty entries for {sorted(s for s, cb in codebooks.items() if cb)}")

    mats = {s: (np.array([c for c, _ in sorted(cb)], dtype=np.int64),
                np.array([v for _, v in sorted(cb)], dtype=np.float64))
            for s, cb in codebooks.items()}

    def _assign(batches):
        for pdf in batches:
            # -1 sentinel: a sub_idx outside the codebooks must fail loudly,
            # never emit uninitialized garbage codes
            out_code = np.full(len(pdf), -1, dtype=np.int32)
            out_dist = np.full(len(pdf), np.nan, dtype=np.float64)
            subs = pdf["sub_idx"].to_numpy()
            vecs = pdf["subvec"]
            for s, (cids, cmat) in mats.items():
                mask = subs == s
                if not mask.any():
                    continue
                x = np.array(vecs[mask].tolist(), dtype=np.float64)
                d2 = ((x[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
                idx = d2.argmin(axis=1)
                out_code[mask] = cids[idx]
                out_dist[mask] = d2[np.arange(len(idx)), idx]
            if (out_code < 0).any():
                bad = sorted(set(subs[out_code < 0].tolist()))
                raise ValueError(f"no codebook for subspace(s) {bad}")
            keep = [id_col, "sub_idx", "subvec"] if keep_subvec else [id_col, "sub_idx"]
            pdf = pdf[keep].copy()
            pdf["code"] = out_code
            pdf["sq_dist"] = out_dist
            yield pdf

    extra = ", subvec array<float>" if keep_subvec else ""
    return subrows.mapInPandas(
        _assign,
        schema=f"{id_col} long, sub_idx int{extra}, code int, sq_dist double")


def train_pq(spark: SparkSession, corpus: DataFrame, m: int = 8,
             n_codes: int = 32, code_mod: int | None = None,
             iters: int = 2, train_mod: int = 1,
             id_col: str = "vec_id", vec_col: str = "embedding") -> Codebooks:
    """Per-subspace codebooks, deterministically initialized (the
    subvectors of the ``n_codes`` vectors first in the portable
    multiplicative-hash order — the same FIXED-k convention as the IVF
    coarse quantizer, so codebook size stays CONSTANT as the corpus
    grows) then refined with Lloyd rounds run for all m subspaces in a
    single job per iteration. Empty codes keep their previous centroid
    (no reseeding). The legacy ``code_mod`` seeding (k = N/mod) is kept
    only for oracle twins / back-compat — its codebooks grow with N.

    ``train_mod`` > 1 trains on the deterministic 1/train_mod sample
    (id % train_mod == 0) — the standard production shape: codebooks
    converge on a sample; the full corpus is only ever *encoded*."""
    from dht11_data_pipeline_spark.operators.kmeans import CENTROID_HASH_SQL
    _check_divisible(corpus, m, vec_col)
    train = corpus if train_mod <= 1 else corpus.filter(
        F.col(id_col) % train_mod == 0)
    subrows = _subvector_rows(train, m, id_col, vec_col)
    if code_mod is not None:
        seed_src = train.filter(F.col(id_col) % code_mod == 0)
    else:
        h = F.expr(CENTROID_HASH_SQL.format(id=id_col))
        seed_src = train.orderBy(h, F.col(id_col)).limit(n_codes)
    seed = (_subvector_rows(seed_src, m, id_col, vec_col)
            .select(id_col, "sub_idx", "subvec").collect())
    codebooks: Codebooks = {}
    for r in seed:
        codebooks.setdefault(int(r["sub_idx"]), []).append(
            (int(r[id_col]), [float(x) for x in r["subvec"]]))
    for s in codebooks:
        codebooks[s] = sorted(codebooks[s])
    for _ in range(iters):
        assigned = _assign_codes(subrows, codebooks, id_col, keep_subvec=True)
        dims = assigned.select(
            "sub_idx", "code", F.posexplode("subvec").alias("dim", "val"))
        means = (dims.groupBy("sub_idx", "code", "dim")
                 .agg(F.avg(F.col("val").cast("double")).alias("mval")))
        rows = (means.groupBy("sub_idx", "code")
                .agg(F.array_sort(F.collect_list(F.struct("dim", "mval"))).alias("dm"))
                .select("sub_idx", "code", F.col("dm.mval").alias("vec"))
                .collect())
        new: Codebooks = {}
        for r in rows:
            new.setdefault(int(r["sub_idx"]), []).append(
                (int(r["code"]), [float(x) for x in r["vec"]]))
        for s, cb in codebooks.items():
            merged = {**dict(cb), **dict(new.get(s, []))}
            codebooks[s] = sorted(merged.items())
    return codebooks


def encode_pq(corpus: DataFrame, codebooks: Codebooks, m: int = 8,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id, codes array<int>): the stored PQ representation — at scale
    this is the compact table you persist (and bucket by IVF cell)."""
    _check_divisible(corpus, m, vec_col)
    assigned = _assign_codes(
        _subvector_rows(corpus, m, id_col, vec_col), codebooks, id_col)
    return (assigned.groupBy(id_col)
            .agg(F.array_sort(F.collect_list(F.struct("sub_idx", "code"))).alias("sc"))
            .select(F.col(id_col), F.col("sc.code").alias("codes")))


def pq_topk(corpus: DataFrame, queries: DataFrame, codebooks: Codebooks,
            m: int = 8, k: int = 5, id_col: str = "vec_id",
            vec_col: str = "embedding") -> DataFrame:
    """ADC top-k: approximate cosine of every (query, corpus) pair from
    code lookups only; top-k per query. Queries are collected (the
    small broadcast side — same contract as cosine_topk's probe set).

    Output (query_id, neighbor_id, approx_cos, rank) — rank by
    (approx_cos desc, neighbor_id) for determinism.
    """
    import numpy as np

    q_rows = sorted(queries.select(id_col, vec_col).collect(),
                    key=lambda r: r[id_col])
    qids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    qmat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)  # (Q, d)
    qnorm = np.sqrt((qmat ** 2).sum(axis=1))  # (Q,)

    # per-subspace: subvector codebook matrices + dot/norm lookup tables
    if qmat.shape[1] % m != 0:
        raise ValueError(
            f"query width {qmat.shape[1]} not divisible by m={m}")
    subdim = qmat.shape[1] // m
    sub_mats, dot_tabs, normsq_tabs = [], [], []
    for s in range(m):
        cb = sorted(codebooks[s])
        cmat = np.array([v for _, v in cb], dtype=np.float64)  # (k, subdim)
        sub_mats.append(cmat)
        qsub = qmat[:, s * subdim:(s + 1) * subdim]            # (Q, subdim)
        dot_tabs.append(qsub @ cmat.T)                         # (Q, k)
        normsq_tabs.append((cmat ** 2).sum(axis=1))            # (k,)

    # r14 fused encode+ADC (guide §4): one Arrow pass slices each
    # vector into its m subspaces, takes the per-subspace argmin (the
    # encode — identical float64 arithmetic to _assign_codes, so the
    # codebook indices are bit-identical to encode_pq's codes) and
    # scores via the same table lookups. The encode's groupBy
    # collect_list shuffle and the second Python stage are gone; the
    # per-row approx_cos is lookup arithmetic on identical indices, so
    # the emitted doubles are bit-identical to the two-pass form.
    _check_divisible(corpus, m, vec_col)

    def _encode_score(batches):
        import pandas as pd
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)  # (n, d)
            n = len(pdf)
            dots = np.zeros((n, len(qids)))
            nsq = np.zeros(n)
            for s in range(m):
                xs = x[:, s * subdim:(s + 1) * subdim]
                d2 = ((xs[:, None, :] - sub_mats[s][None, :, :]) ** 2) \
                    .sum(axis=2)
                idx = d2.argmin(axis=1)
                dots += dot_tabs[s][:, idx].T   # (n, Q)
                nsq += normsq_tabs[s][idx]
            xnorm = np.sqrt(nsq)  # (n,)
            cos = dots / (xnorm[:, None] * qnorm[None, :])
            yield pd.DataFrame({
                "query_id": np.repeat(qids[None, :], n, axis=0).ravel(),
                "neighbor_id": np.repeat(pdf[id_col].to_numpy(), len(qids)),
                "approx_cos": cos.ravel(),
            })

    scored = right_size(corpus).select(id_col, vec_col).mapInPandas(
        _encode_score,
        schema="query_id long, neighbor_id long, approx_cos double")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("approx_cos"), "neighbor_id")
    return (scored.filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def ivfpq_topk(corpus: DataFrame, queries: DataFrame, codebooks: Codebooks,
               m: int = 8, k: int = 5, n_centroids: int = 50,
               centroid_mod: int | None = None,
               nprobe: int = 2, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """IVF-PQ: coarse-quantize the corpus into inverted cells (the
    deterministic sampled centroids the IVF tier uses), PQ-encode every
    vector, then score a query via ADC against ONLY its ``nprobe``
    nearest cells' codes. This is the production composition: at 100 TB
    the codes table is stored bucketed by cell_id, a probe reads
    nprobe/C of the corpus, and each read row costs m table lookups
    instead of a d-dim dot product — both factors multiply.

    Plan: one Arrow pass assigns (cell, codes) per corpus row; the
    probe-cell restriction is applied inside the scorer (each row is
    scored only against the queries probing its cell — no crossJoin of
    the full query set), followed by the per-query top-k window.
    """
    import numpy as np

    from dht11_data_pipeline_spark.operators.kmeans import select_centroids

    if centroid_mod is not None:
        cent_rows = sorted(
            corpus.filter(F.col(id_col) % centroid_mod == 0)
            .select(id_col, vec_col).collect(), key=lambda r: r[id_col])
        centroids = [(int(r[id_col]), [float(x) for x in r[vec_col]])
                     for r in cent_rows]
    else:
        # fixed-k coarse quantizer: constant centroid count regardless
        # of corpus size (see kmeans.select_centroids)
        centroids = select_centroids(corpus, n_centroids, id_col, vec_col)
    cmat = np.array([v for _, v in centroids], dtype=np.float64)
    cids = np.array([c for c, _ in centroids], dtype=np.int64)

    q_rows = sorted(queries.select(id_col, vec_col).collect(),
                    key=lambda r: r[id_col])
    qids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    qmat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    qnorm = np.sqrt((qmat ** 2).sum(axis=1))
    # nprobe nearest cells per query (squared L2, ties by centroid id —
    # same metric the corpus assignment uses)
    qd2 = ((qmat[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
    probe_order = np.argsort(qd2, axis=1, kind="stable")[:, :nprobe]
    cell_to_q: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        for cell in cids[probe_order[qi]]:
            cell_to_q.setdefault(int(cell), []).append(qi)

    subdim = qmat.shape[1] // m
    sub_mats, dot_tabs, normsq_tabs = [], [], []
    for s in range(m):
        cb = sorted(codebooks[s])
        sub_c = np.array([v for _, v in cb], dtype=np.float64)
        sub_mats.append(sub_c)
        dot_tabs.append(qmat[:, s * subdim:(s + 1) * subdim] @ sub_c.T)
        normsq_tabs.append((sub_c ** 2).sum(axis=1))

    # r14 fused cell-assign + encode + ADC (guide §4): ONE Arrow pass
    # replaces the three-frame shape (assign_clusters pass + encode_pq
    # pass + groupBy collect_list + id-keyed join). Per batch: the cell
    # is the full-vector squared-L2 argmin (identical float64
    # arithmetic to assign_clusters), each subspace code is the subvec
    # argmin (identical to _assign_codes), and the ADC lookups consume
    # those indices directly — every emitted double is bit-identical
    # to the old chain's, and per-row results are batch-independent,
    # so the multiset out is unchanged.
    _check_divisible(corpus, m, vec_col)

    def _score(batches):
        import pandas as pd
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)  # (n, d)
            ids_np = pdf[id_col].to_numpy()
            cd2 = ((x[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
            cells_np = cids[cd2.argmin(axis=1)]
            idx = np.empty((len(pdf), m), dtype=np.int64)
            nsq = np.zeros(len(pdf))
            for s in range(m):
                xs = x[:, s * subdim:(s + 1) * subdim]
                d2 = ((xs[:, None, :] - sub_mats[s][None, :, :]) ** 2) \
                    .sum(axis=2)
                idx[:, s] = d2.argmin(axis=1)
                nsq += normsq_tabs[s][idx[:, s]]
            xnorm = np.sqrt(nsq)
            outs = []
            for cell, qlist in cell_to_q.items():
                mask = cells_np == cell
                if not mask.any():
                    continue
                qs = np.array(qlist)
                dots = np.zeros((mask.sum(), len(qs)))
                for s in range(m):
                    dots += dot_tabs[s][qs][:, idx[mask, s]].T
                cos = dots / (xnorm[mask][:, None] * qnorm[qs][None, :])
                n = int(mask.sum())
                outs.append(pd.DataFrame({
                    "query_id": np.repeat(qids[qs][None, :], n, axis=0).ravel(),
                    "neighbor_id": np.repeat(ids_np[mask], len(qs)),
                    "approx_cos": cos.ravel(),
                }))
            if outs:
                yield pd.concat(outs)

    scored = right_size(corpus).select(id_col, vec_col).mapInPandas(
        _score, schema="query_id long, neighbor_id long, approx_cos double")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("approx_cos"), "neighbor_id")
    return (scored.filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
