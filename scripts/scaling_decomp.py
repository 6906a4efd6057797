#!/usr/bin/env python
"""Per-wave scaling decomposition (the BENCH_scaling_*_decomp generator).

Runs the bench-shaped crawl (same corpus + config as bench.py's
headline crawl) at two CPU counts in FRESH processes and reports
per-wave wall/pipeline efficiency plus the driver-serial residual
(total − Σ wave sec: frontier pop, strategy, push-back). This is the
instrument behind the north rule's two-cluster-size evidence: overall
efficiency plus which wave sizes are barrier-bound vs compute-bound.

Usage: python scripts/scaling_decomp.py [LO HI] [--reps N] [-o OUT.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = r"""
import json, shutil, sys, time
import ray

ncpu = int(sys.argv[1])
rep = sys.argv[2]
ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
ctx = DataContext.get_current()
ctx.enable_progress_bars = False
ctx.enable_tensor_extension_casting = False

sys.path.insert(0, ".")
import bench
from playwrightcrawler_ray.config import CrawlConfig
from playwrightcrawler_ray.corpus import build_corpus
from playwrightcrawler_ray.pipelines.crawl import run_crawl

corpus = build_corpus(
    seed=42, n_hosts=bench.CRAWL_HOSTS,
    pages_per_host=bench.CRAWL_PAGES_PER_HOST, n_seeds=bench.CRAWL_HOSTS,
    text_words=bench.CRAWL_TEXT_WORDS, img_sizes=bench.CRAWL_IMG_SIZES,
)
out = f"/tmp/pwc_decomp_{ncpu}_{rep}"
shutil.rmtree(out, ignore_errors=True)
cfg = CrawlConfig(output_dir=out, max_waves=4,
                  per_host_per_wave=bench.CRAWL_PER_HOST_PER_WAVE,
                  wave_size=200_000, method_weights={"oldest": 1},
                  checkpoint_every=8, wave_batch_size=256)
t0 = time.perf_counter()
res = run_crawl(corpus, cfg, seen_mode="cuckoo")
sec = time.perf_counter() - t0
print(json.dumps({
    "ncpu": ncpu, "sec": round(sec, 3),
    "pps": round(res.stats["pages_fetched"] / sec, 2),
    "waves": [
        {"wave": w["wave"], "urls": w["urls"], "sec": w["sec"],
         "pipeline_sec": w["pipeline_sec"]}
        for w in res.wave_log
    ],
}))
ray.shutdown()
"""


def one(ncpu: int, reps: int) -> dict:
    best = None
    for rep in range(reps):
        out = subprocess.run(
            [sys.executable, "-c", _CHILD, str(ncpu), str(rep)],
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ).stdout
        r = json.loads(out.strip().splitlines()[-1])
        if best is None or r["sec"] < best["sec"]:
            best = r
    return best


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    lo_n, hi_n = (int(args[0]), int(args[1])) if len(args) >= 2 else (4, 16)
    reps = (
        int(sys.argv[sys.argv.index("--reps") + 1])
        if "--reps" in sys.argv else 1
    )
    lo, hi = one(lo_n, reps), one(hi_n, reps)
    ratio = hi_n / lo_n
    per_wave = []
    for wl, wh in zip(lo["waves"], hi["waves"]):
        per_wave.append(
            {
                "wave": wl["wave"], "urls": wl["urls"],
                f"sec_{lo_n}": wl["sec"], f"sec_{hi_n}": wh["sec"],
                f"pipeline_{lo_n}": wl["pipeline_sec"],
                f"pipeline_{hi_n}": wh["pipeline_sec"],
                "eff": round(wl["sec"] / wh["sec"] / ratio, 3),
                "pipeline_eff": round(
                    wl["pipeline_sec"] / wh["pipeline_sec"] / ratio, 3
                ),
            }
        )
    result = {
        "lo": lo, "hi": hi,
        "overall_eff": round(lo["sec"] / hi["sec"] / ratio, 3),
        "driver_serial_lo": round(
            lo["sec"] - sum(w["sec"] for w in lo["waves"]), 3
        ),
        "driver_serial_hi": round(
            hi["sec"] - sum(w["sec"] for w in hi["waves"]), 3
        ),
        "per_wave": per_wave,
    }
    out = json.dumps(result)
    if "-o" in sys.argv:
        with open(sys.argv[sys.argv.index("-o") + 1], "w") as f:
            f.write(out + "\n")
    print(out)


if __name__ == "__main__":
    main()
