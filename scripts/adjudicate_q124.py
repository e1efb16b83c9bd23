import json, os, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from mapreduce_paper_implementation_spark.operators.caching import release_persisted
from mapreduce_paper_implementation_spark.session import get_spark
from mapreduce_paper_implementation_spark.sources.tables import load_table

spark = get_spark("adjudicate_q124")
from mapreduce_paper_implementation_spark.plans.queries import QUERIES
from mapreduce_paper_implementation_spark.operators.dedup import ngram_jaccard_pairs
from mapreduce_paper_implementation_spark.operators.graph import connected_components

SF = "/root/testdata/sf0.1"
docs = load_table(spark, SF, "documents")
docs.limit(10).collect()

def walls(repeat=3):
    out = []
    for _ in range(repeat):
        t0 = time.perf_counter()
        QUERIES["q124_leakage_safe_split"](spark, SF).write.format("noop").mode("overwrite").save()
        out.append(round(time.perf_counter() - t0, 3))
        release_persisted(); spark.catalog.clearCache()
    return out

inline = walls()
with tempfile.TemporaryDirectory() as tmp:
    cut = os.path.join(tmp, "cc_cut")
    connected_components(ngram_jaccard_pairs(docs, threshold=0.1)).write.mode("overwrite").parquet(cut)
    release_persisted(); spark.catalog.clearCache()
    os.environ["SPARK_GRAFT_CC_CUT"] = cut
    try:
        with_cut = walls()
    finally:
        del os.environ["SPARK_GRAFT_CC_CUT"]
print(json.dumps({"inline": inline, "with_cut": with_cut,
                  "inline_best": min(inline), "with_cut_best": min(with_cut)}))
