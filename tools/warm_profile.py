"""Profile the bench warm pass: per-query wall at sf0.001 with N
submitter threads, slowest first.

The r12 motivation: the round driver killed the r11 32-cpu bench on a
timeout (BENCH_r11.json rc 124), and the warm pass turned out to be the
largest non-timed block of bench wall-clock (837 s even with 4
submitter threads). This tool answers: which queries make warm slow,
and how does thread count move the total?

Usage: python tools/warm_profile.py [n_threads]
Env: WARM_SF_DIR (default /root/testdata/sf0.001), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import queue
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tytodb_spark import queries as Q
from tytodb_spark.session import get_spark, release_persistent_rdds


def main() -> None:
    n_threads = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    warm_dir = os.environ.get("WARM_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("tyto_warm_profile", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    Q.REGISTRY["q01_filter_scan"].fn(spark, warm_dir).count()

    work: queue.SimpleQueue = queue.SimpleQueue()
    for name, qd in Q.REGISTRY.items():
        work.put((name, qd))
    times: dict[str, float] = {}
    lock = threading.Lock()

    def drain() -> None:
        while True:
            try:
                name, qd = work.get_nowait()
            except queue.Empty:
                return
            t0 = time.perf_counter()
            try:
                (qd.bench_fn or qd.fn)(spark, warm_dir).count()
            except Exception as e:
                print(f"# warm error {name}: {e}", file=sys.stderr)
            with lock:
                times[name] = time.perf_counter() - t0

    t0 = time.perf_counter()
    threads = [threading.Thread(target=drain) for _ in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    release_persistent_rdds(spark, keep=set())

    busy = sum(times.values())
    print(f"threads={n_threads} wall={wall:.1f}s busy={busy:.1f}s "
          f"(parallelism {busy / wall:.2f}x)")
    for name, t in sorted(times.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {t:6.2f}  {name}")
    spark.stop()


if __name__ == "__main__":
    main()
