"""Two-cluster-size scaling evidence (sandbox stand-in for N vs 4N
executors, per BASELINE.json north_rule).

Runs the SAME extract+geotag job on the SAME deterministic corpus at
local[8] and local[32] in fresh JVM subprocesses, reports docs/sec at
both and the scaling efficiency
    eff = (throughput_32 / throughput_8) / (32 / 8)
into BENCH/BASELINE.md.  Gate: eff >= 0.8.

Usage: python tools/scaling_bench.py [n_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from datetime import datetime, timezone

CHILD = r"""
import json, sys, time
sys.path.insert(0, ".")
from geoparser_spark.session import get_spark
from geoparser_spark.operators.extract import extract
from geoparser_spark.operators.geotag import geotag
from geoparser_spark.plans.runtime import salted_repartition
from geoparser_spark.testing.gazetteer import gazetteer_df

cpus, docs_path, n_docs = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
spark = get_spark(app_name=f"scale-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=max(cpus, 8))
gaz = gazetteer_df(spark).cache(); gaz.count()
docs = spark.read.parquet(docs_path)
# warmup with a tiny slice (JIT/codegen outside the measured window)
geotag(extract(docs.limit(200)), gaz).count()
t0 = time.monotonic()
n = geotag(extract(salted_repartition(docs, cpus * 2)), gaz).count()
wall = time.monotonic() - t0
print(json.dumps({"cpus": cpus, "wall_sec": wall, "docs": n_docs,
                  "docs_per_sec": n_docs / wall}))
spark.stop()
"""


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200000
    tmp = tempfile.mkdtemp(prefix="gp_scale_")
    docs_path = os.path.join(tmp, "docs")

    gen = (
        "import sys; sys.path.insert(0, '.');\n"
        "from geoparser_spark.session import get_spark\n"
        "from geoparser_spark.testing.corpus import build_docs\n"
        "spark = get_spark(master='local[32]')\n"
        f"build_docs(spark, {n_docs}, seed=42, partitions=64)"
        f".write.mode('overwrite').parquet('{docs_path}')\n"
        "spark.stop()\n"
    )
    subprocess.run([sys.executable, "-c", gen], check=True)

    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, "-c", CHILD, str(cpus), docs_path, str(n_docs)],
            check=True, capture_output=True, text=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(line)

    tp8, tp32 = results[8]["docs_per_sec"], results[32]["docs_per_sec"]
    eff = (tp32 / tp8) / (32 / 8)
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH — scaling evidence ({stamp})

Same job (extract + geotag over the deterministic interleaved corpus,
seed=42, {n_docs} docs incl. mega-doc skew) on the same parquet input,
two parallelism levels (sandbox stand-in for N vs 4N executors per the
driver instruction; fresh JVM per level, codegen warmed up outside the
measured window).

| cores | wall (s) | docs/sec |
|---|---|---|
| local[8]  | {results[8]['wall_sec']:.2f} | {tp8:.1f} |
| local[32] | {results[32]['wall_sec']:.2f} | {tp32:.1f} |

**Scaling efficiency (8 → 32 cores): {eff:.3f}**  (gate: >= 0.8)

Reference single-node geotag throughput: ~0.6 docs/sec (sequential
per-doc Tika HTTP loop, /root/reference/geoparser_app/views.py:357-402,
README.md:111). This engine: {tp32:.1f} docs/sec at 32 cores —
~{tp32/0.6:.0f}x the reference.
""")
    print(f"efficiency={eff:.3f} -> BENCH/BASELINE.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
