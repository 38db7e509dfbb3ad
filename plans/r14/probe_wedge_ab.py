import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from dht11_data_pipeline_spark.operators import graph

# rebuild a graph shaped like the sf0.1 near-dup graph (2000 nodes, 14412 edges)
edges = set()
n_nodes = 2000
state = 12345
while len(edges) < 14412:
    state = (state * 1103515245 + 12345) % (1 << 31)
    a = state % n_nodes
    state = (state * 1103515245 + 12345) % (1 << 31)
    b = state % n_nodes
    if a != b:
        edges.add((min(a, b), max(a, b)))
rows = sorted(edges)
for fn, tag in ((graph._pair_similarity_dicts, "dicts"),
                (lambda r, c, a: graph._pair_similarity_numpy(
                    np.asarray(r, dtype=np.int64), c, a), "numpy")):
    for aa in (True, False):
        t0 = time.perf_counter()
        out = fn(rows, graph.MAX_CENTER_DEGREE, aa)
        dt = time.perf_counter() - t0
        print(f"{tag:6s} aa={aa}  {dt:7.3f}s  rows={len(out)}")
# equality check on this graph too
ref = graph._pair_similarity_dicts(rows, graph.MAX_CENTER_DEGREE, True)
got = graph._pair_similarity_numpy(np.asarray(rows, dtype=np.int64),
                                   graph.MAX_CENTER_DEGREE, True)
assert list(map(tuple, ref.itertuples(index=False))) == \
       list(map(tuple, got.itertuples(index=False)))
print("EQUAL OK")
