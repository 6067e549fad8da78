"""Single-core cProfile of the annotate engine's extract_mentions loop.

The engine's per-doc Python loop IS the 100-TB cost driver (the Ray
pipeline around it is already zero-copy and embarrassingly parallel), so
this is the profile that decides where optimization effort goes.

Run:  python scripts/profile_engine.py [sf_dir] [n_docs]
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 5000

    import pyarrow.parquet as pq

    from deduce_ray.engine import DeduceEngine
    from deduce_ray.lexicon import DEFAULT_LOOKUP_PATH, load_or_build_lexicon

    lexicon = load_or_build_lexicon(DEFAULT_LOOKUP_PATH)
    engine = DeduceEngine(lexicon=lexicon)
    texts = (
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
        .column("text")
        .to_pylist()
    )
    if not texts:
        raise SystemExit(f"empty corpus: {sf_dir}/documents.parquet has no rows")
    reps = (n_docs + len(texts) - 1) // len(texts)
    texts = (texts * reps)[:n_docs]

    # warm caches (regex compile, memoized word sets) outside the profile
    for t in texts[:50]:
        engine.extract_mentions(t or "")

    t0 = time.time()
    prof = cProfile.Profile()
    prof.enable()
    n = 0
    for t in texts:
        n += len(engine.extract_mentions(t or ""))
    prof.disable()
    dt = time.time() - t0
    print(f"{n_docs} docs, {n} mentions, {dt:.2f}s -> {n_docs / dt:.0f} docs/s")
    stats = pstats.Stats(prof)
    stats.sort_stats("cumulative").print_stats(30)
    stats.sort_stats("tottime").print_stats(25)


if __name__ == "__main__":
    main()
