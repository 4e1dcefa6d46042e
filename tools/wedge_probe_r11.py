"""Wedge-input row counts: id-ordered two-hop vs degree-oriented,
on a mid-id hub star + chain (the skew shape VERDICT r10 item 3 names).
Replicates graph_triangles' two wedge-join shapes on a synthetic rep
edge frame (the claim under test is about the join keying, which is
independent of how the kernel produced the edges)."""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from llm_batch_processor_spark.session import get_spark
spark = get_spark(app_name="wedgeprobe")
n = 1000
hub = n // 2
rows = []
for i in range(n + 1):
    if i != hub:
        rows.append((min(i, hub), max(i, hub), 1, 1))   # star
for i in range(n):
    if i != hub and i + 1 != hub:
        rows.append((i, i + 1, 1, 1))                    # chain
edges = spark.createDataFrame(rows, "id_a bigint, id_b bigint, m_a int, m_b int").persist()
edges.count()

# OLD shape: e1(a,b) join e2(b,c) on the middle id
old_wedges = (
    edges.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    .join(edges.select(F.col("id_a").alias("b"), F.col("id_b").alias("c")), "b")
)
print("old wedge rows (id-ordered two-hop):", old_wedges.count())

# NEW shape: orient by (deg, id), wedge at the min corner
nbr = (
    edges.select(F.col("id_a").alias("g")).unionAll(edges.select(F.col("id_b").alias("g")))
    .groupBy("g").agg(F.count(F.lit(1)).alias("deg"))
)
dd = nbr.select("g", "deg")
ed = edges.join(dd.select(F.col("g").alias("id_a"), F.col("deg").alias("deg_a")), "id_a") \
          .join(dd.select(F.col("g").alias("id_b"), F.col("deg").alias("deg_b")), "id_b")
a_first = (F.col("deg_a") < F.col("deg_b")) | ((F.col("deg_a") == F.col("deg_b")) & (F.col("id_a") < F.col("id_b")))
oriented = ed.select(
    F.when(a_first, F.col("id_a")).otherwise(F.col("id_b")).alias("x"),
    F.when(a_first, F.col("id_b")).otherwise(F.col("id_a")).alias("y"),
)
new_wedges = (
    oriented.select("x", F.col("y").alias("y1"))
    .join(oriented.select("x", F.col("y").alias("y2")), "x")
    .filter(F.col("y1") < F.col("y2"))
)
print("new wedge rows (degree-oriented):", new_wedges.count())
spark.stop()
