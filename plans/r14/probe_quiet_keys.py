import os, sys, time
sys.path.insert(0, "/root/repo")
from dht11_data_pipeline_spark.session import get_spark
import __spark_entry__ as E
sf = "/root/testdata/sf0.1"
spark = get_spark("probe-final")
qs = E.queries()
keys = sys.argv[1:]
for k in keys:
    qs[k](spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
for k in keys:
    reps = []
    for _ in range(4):
        t0 = time.perf_counter()
        qs[k](spark, sf).write.format("noop").mode("overwrite").save()
        reps.append(round(time.perf_counter() - t0, 3))
    print(f"{k:32s} min {min(reps):6.3f}  reps {reps}")
