"""Profile single-searcher query latency on a prebuilt bench index.

Usage: python tools/profile_query.py [IDX_DIR] [--cprofile]
Defaults to the 3.2M-page bench index if present. Reports per-query
latency (warm), the slowest queries with their term df profile, and
optionally a cProfile of the slowest query.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    idx = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else "/tmp/webindex-bench/idx-3200000-16"
    from webindex.search import SearcherActor
    from webindex.synth import synth_queries_table

    # request_cache off: the warm loop runs the same texts, so a cached
    # searcher would measure dict lookups, not the engine
    s = SearcherActor(idx, top_k=1000, mode="auto", request_cache=False)
    texts = synth_queries_table(n=50).column("text").to_pylist()
    # two warm passes: contribution-lookup tables build on a term's
    # SECOND rescore (strike policy — a one-shot term never pays the
    # ~120 ms table build), so pass two is where steady-state caches
    # finish forming
    for _ in range(2):
        for t in texts:
            s.search_one("warm", t)
    lats = []
    for t in texts:
        t0 = time.time()
        s.search_one("q", t)
        lats.append((time.time() - t0, t))
    lats.sort(reverse=True)
    arr = np.array([l for l, _ in lats])
    print(f"p50 {np.percentile(arr, 50)*1000:.1f} ms  "
          f"p95 {np.percentile(arr, 95)*1000:.1f} ms  "
          f"max {arr.max()*1000:.1f} ms")
    reader = s.reader
    print("\nslowest queries (ms, per-term df):")
    for l, t in lats[:8]:
        terms = sorted(set(s.an.tokens(t)))
        dfs = []
        for term in terms:
            pl = reader.postings(term)
            dfs.append(f"{term}:{pl.ids.size if pl is not None else 0}")
        print(f"  {l*1000:8.1f}  {' '.join(dfs)}")

    if "--cprofile" in sys.argv:
        import cProfile
        import pstats

        worst = lats[0][1]
        pr = cProfile.Profile()
        pr.enable()
        for _ in range(10):
            s.search_one("p", worst)
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(25)


if __name__ == "__main__":
    main()
