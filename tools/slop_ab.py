"""A/B probe for the sloppy-phrase chain join on stop-word phrases.

Adversarial shape from VERDICT r10 "What's wrong #1": a slop phrase of
two stop words with tf ~ 10^3 per doc used to build ~tf^2 intermediate
pairs per doc per step. Run before and after the bucketed-interval +
dominance-prune rewrite; record both numbers in SCALE.md round-11
notes.

Usage: python3 tools/slop_ab.py [tf_per_doc] [n_docs]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from esdb_spark.session import get_spark
from esdb_spark.operators.search import boolean_search

tf = int(sys.argv[1]) if len(sys.argv) > 1 else 400
ndocs = int(sys.argv[2]) if len(sys.argv) > 2 else 50

spark = get_spark()
# each doc: "the of the of ... the of" interleaved with filler -> both
# stop words at tf occurrences, so naive chain step is tf*tf pairs/doc
words = []
for i in range(tf):
    words.append("the")
    words.append("of")
    words.append(f"filler{i % 7}")
text = " ".join(words)
docs = spark.createDataFrame(
    [(i, text) for i in range(ndocs)], "doc_id int, text string"
)
docs = docs.localCheckpoint()  # exclude synthesis from timing

t0 = time.time()
n = boolean_search(docs, '"the of"~2').count()
t1 = time.time()
print(
    f'{{"probe": "slop_stopword", "tf": {tf}, "ndocs": {ndocs}, '
    f'"matched": {n}, "sec": {t1 - t0:.2f}}}'
)
spark.stop()
