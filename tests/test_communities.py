"""Brute-force verification of label-propagation communities
(`operators/graph.py::doc_graph_communities`)."""

from collections import Counter, defaultdict

from qrapids_forecast_r_script_spark.operators.dedup import minhash_lsh_pairs
from qrapids_forecast_r_script_spark.operators.graph import (
    _LPA_ITERS,
    doc_graph_communities,
)
from qrapids_forecast_r_script_spark.sources import load_table


def test_lpa_matches_bruteforce(spark, sf_dir):
    docs = [r.doc_id for r in load_table(spark, sf_dir, "documents")
            .select("doc_id").collect()]
    nbrs = defaultdict(list)
    for r in minhash_lsh_pairs(spark, sf_dir).collect():
        nbrs[r.doc_a].append(r.doc_b)
        nbrs[r.doc_b].append(r.doc_a)
    lbl = {d: d for d in docs}
    for _ in range(_LPA_ITERS):
        nxt = {}
        for d in docs:
            if nbrs[d]:
                cnt = Counter(lbl[n] for n in nbrs[d])
                # most frequent, ties to smallest label
                nxt[d] = min(cnt, key=lambda k: (-cnt[k], k))
            else:
                nxt[d] = lbl[d]
        lbl = nxt
    expect = Counter(lbl.values())
    rows = doc_graph_communities(spark, sf_dir).collect()
    got = {r.community: r.n_members for r in rows}
    assert got == dict(expect)
    first = defaultdict(lambda: 1 << 62)
    for d, c in lbl.items():
        first[c] = min(first[c], d)
    assert {r.community: r.first_member for r in rows} == dict(first)
    # ordering: size desc, community asc
    keys = [(-r.n_members, r.community) for r in rows]
    assert keys == sorted(keys)
    # LPA must be at least as fine as connected components: some
    # structure exists (not everything singleton, and the graph is
    # non-trivial on this fixture)
    assert any(n > 1 for n in got.values())
