"""The crawl wave driver: frontier actors + one streaming Dataset per
wave, with per-wave checkpoints.

Replaces the reference's process loop (`main`/`crawler`,
playwrightcrawler.py:5345-5414): instead of N lock-coordinated OS
processes polling Elasticsearch, one logical job alternates

    pop wave from sharded frontier actors
    → Dataset: fetch → parse(+offer links) → imgfetch → decode(+dedup)
    → write parquet partition ``wave=K``
    → checkpoint frontier + dedup shards

Within a wave the streaming executor pipelines all stages across blocks
(the "pipelined fetch/decode/phash-dedup/write" of the north star);
across waves the actors carry state. Determinism: shard pops are
deterministic, the driver merge-sorts candidates by ``(wave, url)``,
and strategy sampling is seeded — so crawl *ordering* is reproducible
and verified against the sequential oracle (tests/test_crawl_golden.py).

Scale notes (100 TB / 10^10 URLs):
- frontier shards scale horizontally (``hash(host) % num_shards``); a
  wave pop is one small RPC per shard;
- the corpus broadcast becomes a real HTTP fetch pool (same stage
  signature);
- parquet output is partitioned per wave (resume skips completed
  waves); Lance is the intended table format on a real deployment —
  parquet-per-wave keeps the same append/versioned layout contract;
- politeness is enforced at pop time, so fetch tasks need no cross-task
  coordination; mega-host skew is bounded by ``per_host_per_wave`` at
  pop time and by ``host_queue_cap`` in memory (sorted-run disk spill
  on the owning shard, state/frontier.py).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field
from itertools import chain
from urllib.parse import urlsplit

import pyarrow as pa

import ray
import ray.data

from ..config import CrawlConfig
from ..corpus.generate import CorpusData
from ..state.dedup import DedupShard
from ..state.frontier import FrontierShard, shard_of
from ..stages.ray_stages import (
    make_decode_fn,
    make_fetch_fn,
    make_imgfetch_fn,
    make_parse_fn,
)
from ..urlkit.canonicalize import canonicalize_url
from ..urlkit.ids import url_id_64
from .strategy import apply_strategy, choose_strategy, wave_rng


@ray.remote
def _wave_chunk_task(fns_ref, tbl: pa.Table, path: str) -> int:
    """Small-wave fast path: one chunk through the SAME fused stage
    chain the Dataset path runs (fetch → parse → imgfetch → decode),
    written as one parquet file. A streaming-executor job costs ~1.5 s
    of fixed driver overhead per wave — for sub-second waves that fixed
    cost is the 4→16-CPU scaling ceiling (the barrier-bound waves of
    BENCH_scaling_r3_4v16_decomp); plain tasks keep the parallelism
    (one task per chunk) without the executor. Output is identical:
    same functions, same chunk boundaries = same batches. ``fns``
    arrives as an ObjectRef argument (one ``ray.put`` per crawl, Ray
    resolves it per task from the local object store — broadcast, not
    re-shipped per chunk)."""
    import pyarrow.parquet as pq

    fetch_fn, parse_fn, imgfetch_fn, decode_fn = fns_ref
    if os.environ.get("PWC_STAGE_TIMING"):
        import time as _t

        ts = [_t.perf_counter()]
        a = fetch_fn(tbl); ts.append(_t.perf_counter())
        b = parse_fn(a); ts.append(_t.perf_counter())
        c = imgfetch_fn(b); ts.append(_t.perf_counter())
        out = decode_fn(c); ts.append(_t.perf_counter())
        pq.write_table(out, path); ts.append(_t.perf_counter())
        d = [round(ts[i + 1] - ts[i], 3) for i in range(5)]
        print(f"[stage-timing] rows={tbl.num_rows} fetch={d[0]} "
              f"parse={d[1]} imgfetch={d[2]} decode={d[3]} write={d[4]}")
        return out.num_rows
    out = decode_fn(imgfetch_fn(parse_fn(fetch_fn(tbl))))
    pq.write_table(out, path)
    return out.num_rows


@dataclass
class CrawlResult:
    """Crawl outcome. The crawl ORDER is not held in driver memory —
    each wave appends its selected URLs to an immutable per-wave log
    under ``<output_dir>/order/`` (driver memory stays O(waves), not
    O(pages); VERDICT round 1 item 5). ``order`` reads those logs back
    on demand (tests / small runs only — at 10^10 URLs consume the log
    files directly)."""

    waves: int = 0
    pages_written: int = 0
    output_dir: str = ""
    stats: dict = field(default_factory=dict)
    wave_log: list[dict] = field(default_factory=list)
    order_files: list[str] = field(default_factory=list)

    @property
    def order(self) -> list[str]:
        out: list[str] = []
        for path in self.order_files:
            with open(path) as f:
                out.extend(line.rstrip("\n") for line in f)
        return out

    def seen_ids(self) -> set[int]:
        return set(self.stats.get("seen_ids", []))


def _seed_offers(seeds: list[str], cfg: CrawlConfig, ctx_policy) -> list[tuple]:
    items = []
    for raw in seeds:
        cu = canonicalize_url(raw)
        p = urlsplit(cu)
        if not p.hostname or not ctx_policy.admit(cu, p.hostname):
            continue
        items.append((cu, url_id_64(cu), p.hostname, p.path or "/", 0))
    return items


class CrawlEngine:
    """Owns the actor fleet and the wave loop. Ray must already be
    initialised by the caller (driver contract)."""

    def __init__(self, corpus: CorpusData, cfg: CrawlConfig | None = None,
                 seen_mode: str = "exact"):
        self.cfg = cfg or CrawlConfig()
        self.corpus = corpus
        self.seen_mode = seen_mode
        self._RemoteShard = ray.remote(num_cpus=0)(FrontierShard)
        self._RemoteDedup = ray.remote(num_cpus=0)(DedupShard)
        self.shards = [self._make_frontier(i)
                       for i in range(self.cfg.num_frontier_shards)]
        self.dedup = [self._make_dedup(i)
                      for i in range(self.cfg.num_seen_shards)]
        self.actor_recoveries = 0
        from ..corpus.store import put_corpus_index

        self.corpus_ref = put_corpus_index(corpus.pages)
        self.latency_ref = (
            ray.put(dict(corpus.latency_ms))
            if self.cfg.simulate_latency and corpus.latency_ms
            else None
        )
        from ..stages.process import ProcessContext

        self._pctx = ProcessContext(self.cfg)
        self._seed_robots()

    def _make_frontier(self, i: int):
        spill_root = os.path.join(self.cfg.output_dir, "spill")
        return self._RemoteShard.remote(
            i, self.seen_mode,
            host_queue_cap=self.cfg.host_queue_cap,
            spill_dir=os.path.join(spill_root, f"shard_{i:03d}"),
        )

    def _make_dedup(self, i: int):
        return self._RemoteDedup.remote(
            i, self.cfg.image_seen_mode,
            capacity=self.cfg.image_seen_capacity,
        )

    def _seed_robots(self) -> None:
        # robots preload: "fetched once per host through the corpus
        # interface", cached on the owning shard (north-rule robots cache)
        if self.cfg.respect_robots and self.corpus.robots:
            by_shard: dict[int, list] = {}
            for host, text in self.corpus.robots.items():
                by_shard.setdefault(
                    shard_of(host, self.cfg.num_frontier_shards), []
                ).append((host, text))
            ray.get([self.shards[s].set_robots.remote(items)
                     for s, items in by_shard.items()])

    # --- actor-loss recovery (VERDICT r4 item 5) ---

    def _alive(self, actor) -> bool:
        try:
            ray.get(actor.ping.remote())
            return True
        except ray.exceptions.RayActorError:
            return False

    def _recover_from_actor_loss(self) -> bool:
        """On a real multi-node cluster shard-actor loss (node death,
        OOM kill) is routine. Recreate every dead frontier/dedup shard
        and rewind the WHOLE fleet to the last published per-wave
        checkpoint — live shards hold mid-wave state ahead of the
        barrier, and mixing barrier states across shards would be
        inconsistent. The caller then replays from the checkpoint wave
        (the wave loop is deterministic, so the replay reproduces the
        uninterrupted run exactly). Returns False when no actor is
        actually dead — the failure was something else; re-raise it."""
        revived = 0
        for a in (*self.shards, *self.dedup):
            if not self._alive(a):
                revived += 1
        if revived == 0:
            return False
        # the background checkpoint thread may hold blob refs owned by
        # a dead actor — join and swallow; we rewind past it anyway
        try:
            self._join_checkpoint()
        except BaseException:
            pass
        # Recreate the WHOLE fleet as fresh actor instances — dead AND
        # surviving shards. Sibling tasks of the failed wave may still
        # be in flight (the Dataset executor tears its tasks down
        # asynchronously; the caller cancels the plain-task path's
        # refs, but cancellation is best-effort): their in-band dedup
        # claims / frontier offers must land on KILLED handles and
        # fail harmlessly rather than mutate the restored state of a
        # surviving shard mid-rewind.
        for i, a in enumerate(self.shards):
            if self._alive(a):
                ray.kill(a, no_restart=True)
            self.shards[i] = self._make_frontier(i)
        for i, a in enumerate(self.dedup):
            if self._alive(a):
                ray.kill(a, no_restart=True)
            self.dedup[i] = self._make_dedup(i)
        # (with no published checkpoint the caller's _init_run_state
        # finds nothing to restore and restarts from seeds — correct
        # for death before the first barrier, since the fleet is fresh)
        self._seed_robots()  # fresh shards need rules; restore overwrites
        self.actor_recoveries += revived
        return True

    # --- frontier plumbing ---

    def _offer(self, items: list[tuple]) -> None:
        by_shard: dict[int, list] = {}
        for it in items:
            by_shard.setdefault(
                shard_of(it[2], self.cfg.num_frontier_shards), []
            ).append(it)
        ray.get([self.shards[s].offer.remote(v) for s, v in by_shard.items()])

    def _pop_merged(self, wave: int) -> list[tuple[int, str, str]]:
        parts = ray.get(
            [s.pop_candidates.remote(wave, self.cfg.per_host_per_wave)
             for s in self.shards]
        )
        return sorted(chain.from_iterable(parts))

    def _push_back(self, leftover: list[tuple[int, str, str]]) -> None:
        if not leftover:
            return
        by_shard: dict[int, list] = {}
        for cand in leftover:
            by_shard.setdefault(
                shard_of(cand[2], self.cfg.num_frontier_shards), []
            ).append(cand)
        ray.get([self.shards[s].push_back.remote(v) for s, v in by_shard.items()])

    def _queued(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    # --- checkpointing (per-partition: one blob per shard per wave) ---

    def _checkpoint(self, wave: int, wave_log: list[dict]) -> None:
        """Per-wave checkpoint. The actor-state snapshot RPCs are issued
        HERE, at the barrier — each shard serializes its state before it
        processes the driver's next ``pop_candidates`` (same-caller actor
        message order), and wave K+1's worker-side offers can only start
        after every pop returns, so the snapshot is exactly the wave-K
        barrier state regardless of publication timing. With
        ``cfg.async_checkpoint`` only the blob await + file writes move
        to a background thread (at most one in flight; joined before the
        next checkpoint and at run end), keeping seconds of serialized
        file IO off the wave critical path — the barrier cost the 4v16
        decomposition (BENCH_scaling_r3_4v16_decomp) flagged."""
        blob_refs = [s.checkpoint.remote() for s in self.shards]
        dblob_refs = [d.checkpoint.remote() for d in self.dedup]
        snapshot = [dict(e) for e in wave_log]
        if not self.cfg.async_checkpoint:
            self._publish_checkpoint(wave, snapshot, blob_refs, dblob_refs)
            return
        import threading

        self._join_checkpoint()

        def _worker():
            try:
                self._publish_checkpoint(wave, snapshot, blob_refs, dblob_refs)
            except BaseException as e:  # surfaced at the next join
                self._ck_err = e

        self._ck_thread = threading.Thread(target=_worker, daemon=True)
        self._ck_thread.start()

    def _join_checkpoint(self) -> None:
        t = getattr(self, "_ck_thread", None)
        if t is not None:
            t.join()
            self._ck_thread = None
        err = getattr(self, "_ck_err", None)
        if err is not None:
            self._ck_err = None
            raise err

    def _publish_checkpoint(self, wave: int, wave_log: list[dict],
                            blob_refs, dblob_refs) -> None:
        ckdir = os.path.join(self.cfg.output_dir, "checkpoints", f"wave={wave:05d}")
        tmp = ckdir + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        for i, blob in enumerate(ray.get(blob_refs)):
            with open(os.path.join(tmp, f"frontier_{i:03d}.bin"), "wb") as f:
                f.write(blob)
        for i, blob in enumerate(ray.get(dblob_refs)):
            with open(os.path.join(tmp, f"dedup_{i:03d}.bin"), "wb") as f:
                f.write(blob)
        # meta carries only O(waves) state; the crawl order lives in the
        # immutable per-wave logs under <output_dir>/order/
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump({"wave": wave, "wave_log": wave_log}, f)
        if os.path.exists(ckdir):
            shutil.rmtree(ckdir)
        os.rename(tmp, ckdir)  # atomic publish
        retain = self.cfg.checkpoint_retain
        if retain > 0:
            root = os.path.join(self.cfg.output_dir, "checkpoints")
            old = sorted(d for d in os.listdir(root)
                         if d.startswith("wave=") and not d.endswith(".tmp"))
            for d in old[:-retain]:
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)

    def restore_latest_checkpoint(self) -> dict | None:
        root = os.path.join(self.cfg.output_dir, "checkpoints")
        if not os.path.isdir(root):
            return None
        # a crash can leave a half-written `.tmp` staging dir behind —
        # only atomically-published checkpoints are restore candidates
        waves = sorted(d for d in os.listdir(root)
                       if d.startswith("wave=") and not d.endswith(".tmp"))
        if not waves:
            return None
        ckdir = os.path.join(root, waves[-1])
        with open(os.path.join(ckdir, "meta.json")) as f:
            meta = json.load(f)
        futs = []
        for i, s in enumerate(self.shards):
            with open(os.path.join(ckdir, f"frontier_{i:03d}.bin"), "rb") as f:
                futs.append(s.restore.remote(f.read()))
        for i, d in enumerate(self.dedup):
            with open(os.path.join(ckdir, f"dedup_{i:03d}.bin"), "rb") as f:
                futs.append(d.restore.remote(f.read()))
        ray.get(futs)
        return meta

    # --- the wave loop ---

    def _build_stage_fns(self):
        """The four wave-stage closures. Rebuilt after actor-loss
        recovery — they capture frontier/dedup actor handles, and the
        recovered fleet has new ones."""
        cfg = self.cfg
        use_http = cfg.fetch_backend == "http" and bool(cfg.http_addr)
        http_addr = cfg.http_addr if use_http else None
        flaky_ref = (
            ray.put(dict(self.corpus.flaky))
            if self.corpus.flaky and not use_http else None
        )
        partial_ref = (
            ray.put(dict(self.corpus.partial))
            if self.corpus.partial and not use_http else None
        )
        fetch_fn = make_fetch_fn(
            self.corpus_ref,
            None if use_http else self.latency_ref, flaky_ref,
            retries=cfg.fetch_retries, backoff_base_s=cfg.fetch_backoff_base_s,
            partial_ref=partial_ref, range_resume=cfg.range_resume,
            http_addr=http_addr,
        )
        imgfetch_fn = make_imgfetch_fn(
            self.corpus_ref, None if use_http else self.latency_ref,
            self.dedup, partial_ref=partial_ref,
            range_resume=cfg.range_resume, http_addr=http_addr,
            retries=cfg.fetch_retries,
            backoff_base_s=cfg.fetch_backoff_base_s,
        )
        decode_fn = make_decode_fn(cfg, self.dedup, self.shards)
        parse_fn = make_parse_fn(
            cfg, corpus_ref=self.corpus_ref, http_addr=http_addr,
            retries=cfg.fetch_retries,
            backoff_base_s=cfg.fetch_backoff_base_s,
            range_resume=cfg.range_resume,
        )
        return fetch_fn, parse_fn, imgfetch_fn, decode_fn

    def _init_run_state(self, resume: bool) -> tuple[int, list, list, int]:
        """(start_wave, wave_log, order_files, pages_fetched) — shared
        by resume-at-start and mid-run actor-loss recovery. With
        ``resume`` the shard fleet is restored from the last published
        checkpoint and outputs beyond it are cleared for replay; with
        no checkpoint (or ``resume=False``) the run starts from seeds."""
        cfg = self.cfg
        os.makedirs(cfg.output_dir, exist_ok=True)
        order_dir = os.path.join(cfg.output_dir, "order")
        os.makedirs(order_dir, exist_ok=True)
        order_files: list[str] = []
        pages_fetched = 0
        wave_log: list[dict] = []
        start_wave = 0
        meta = self.restore_latest_checkpoint() if resume else None
        if meta is not None:
            wave_log = list(meta["wave_log"])
            start_wave = meta["wave"] + 1
            # wave outputs and order logs beyond the checkpoint are
            # replayed — clear them so nothing can duplicate
            import glob as _glob

            for d in _glob.glob(os.path.join(cfg.output_dir, "wave=*")):
                if int(d.rsplit("=", 1)[1]) >= start_wave:
                    shutil.rmtree(d, ignore_errors=True)
            for p in sorted(_glob.glob(os.path.join(order_dir, "wave=*.txt"))):
                w = int(os.path.basename(p)[5:10])
                if w >= start_wave:
                    os.remove(p)
                else:
                    order_files.append(p)
                    with open(p) as f:
                        pages_fetched += sum(1 for _ in f)
        else:
            shutil.rmtree(order_dir, ignore_errors=True)
            os.makedirs(order_dir, exist_ok=True)
            if not resume:
                # fresh run: stale checkpoints from a previous run in the
                # same output_dir must not survive — mid-run actor-loss
                # recovery picks the HIGHEST checkpoint wave and would
                # silently restore another run's frontier/dedup state
                shutil.rmtree(os.path.join(cfg.output_dir, "checkpoints"),
                              ignore_errors=True)
            self._offer(_seed_offers(self.corpus.seeds, cfg, self._pctx.policy))
        return start_wave, wave_log, order_files, pages_fetched

    def run(self, resume: bool = False, max_waves: int | None = None,
            collect_seen_ids: bool = False) -> CrawlResult:
        cfg = self.cfg
        order_dir = os.path.join(cfg.output_dir, "order")
        start_wave, wave_log, order_files, pages_fetched = \
            self._init_run_state(resume)

        # real-socket backend: latency/flaky/truncation happen on the
        # server and in the client's own retry/Range loops — the
        # simulation refs must not double-apply
        fetch_fn, parse_fn, imgfetch_fn, decode_fn = self._build_stage_fns()
        limit = max_waves if max_waves is not None else cfg.max_waves

        t0 = time.perf_counter()
        wave = start_wave
        empty_streak = 0
        recoveries = 0
        last_wave_stats = ""
        fns_ref = None  # one object-store put of the stage chain, lazy
        inflight: list = []  # plain-task path's chunk refs (for cancel)
        while wave < limit:
            try:
                candidates = self._pop_merged(wave)
                if not candidates:
                    if self._queued() == 0:
                        break
                    wave += 1
                    empty_streak += 1
                    if empty_streak > 64:
                        break
                    continue
                rng = wave_rng(cfg.seed, wave)
                strategy = choose_strategy(rng, cfg.method_weights)
                selected, leftover = apply_strategy(
                    strategy, candidates, cfg.wave_size, rng,
                    cfg.reproduce_reference_bugs,
                )
                self._push_back(leftover)
                if not selected:
                    wave += 1
                    empty_streak += 1
                    if empty_streak > 64:
                        break
                    continue
                empty_streak = 0
                urls = [u for _, u, _ in selected]
                hosts = [h for _, _, h in selected]

                tw = time.perf_counter()
                tbl = pa.table(
                    {
                        "url": pa.array(urls, pa.string()),
                        "host": pa.array(hosts, pa.string()),
                        "wave": pa.array([wave] * len(urls), pa.int32()),
                        # lineage ord: position in the wave's selected order
                        "ord": pa.array(range(len(urls)), pa.int64()),
                    }
                )
                # pre-slice into one Arrow table per wave block: from_arrow
                # makes each a block directly (no Repartition operator), and
                # a uniform batch_size across the fused stage chain keeps
                # task granularity = one block (see CrawlConfig note).
                # Adaptive: small waves shrink the batch so every CPU gets
                # ~4 tasks of slack (a 1k-URL wave at batch 256 is only 4
                # tasks — idle cores on an 8-CPU cluster); large waves cap
                # at wave_batch_size.
                try:
                    ncpu = max(1, int(ray.cluster_resources().get("CPU", 1)))
                except Exception:  # pragma: no cover - resources always known
                    ncpu = 1
                bs = min(cfg.wave_batch_size,
                         max(32, -(-len(urls) // (ncpu * 4))))
                chunks = [tbl.slice(i, bs) for i in range(0, len(urls), bs)]
                wave_dir = os.path.join(cfg.output_dir, f"wave={wave:05d}")
                shutil.rmtree(wave_dir, ignore_errors=True)
                # link offers + dedup claims happen INSIDE the decode stage
                # (awaited per batch) — the write barrier (all chunk tasks
                # done / write_parquet returned) therefore means: every link
                # row is durable AND offered, every dedup claim staged.
                if (cfg.small_wave_task_path_max > 0
                        and len(urls) <= cfg.small_wave_task_path_max):
                    # small-wave fast path: same fns, same chunk boundaries,
                    # one plain Ray task per chunk — skips the streaming
                    # executor's ~1.5 s fixed per-job driver overhead that
                    # dominates sub-second waves (the barrier-bound waves of
                    # BENCH_scaling_r3_4v16_decomp)
                    if fns_ref is None:
                        fns_ref = ray.put(
                            (fetch_fn, parse_fn, imgfetch_fn, decode_fn)
                        )
                    os.makedirs(wave_dir, exist_ok=True)
                    inflight = [
                        _wave_chunk_task.remote(
                            fns_ref, c,
                            os.path.join(wave_dir, f"part-{i:05d}.parquet"),
                        )
                        for i, c in enumerate(chunks)
                    ]
                    ray.get(inflight)
                    inflight = []
                    ds = None
                else:
                    ds = ray.data.from_arrow(chunks)
                    for fn in (fetch_fn, parse_fn, imgfetch_fn, decode_fn):
                        ds = ds.map_batches(
                            fn, batch_format="pyarrow", batch_size=bs
                        )
                    ds.write_parquet(wave_dir)
                t_write = time.perf_counter()
                conflicts: list[tuple[int, list[int]]] = []
                for part in ray.get([d.commit_wave.remote() for d in self.dedup]):
                    conflicts.extend(part)
                if conflicts:
                    # rare-ish (stage_many_keyed prunes sure losers): the
                    # shards reported every kept claimant's ord, so loser
                    # ords are computed locally and only the files holding
                    # them are rewritten — no scan, bytes never re-read
                    full_l, img_l = _loser_ords(conflicts)
                    if full_l or img_l:
                        _write_tombstones(wave_dir, full_l, img_l)
                t_fixup = time.perf_counter()
                t_pipeline = time.perf_counter() - tw
                if ds is not None:
                    last_wave_stats = ds.stats()
                # append-only order log: one immutable file per wave
                opath = os.path.join(order_dir, f"wave={wave:05d}.txt")
                with open(opath + ".tmp", "w") as f:
                    f.write("".join(u + "\n" for u in urls))
                os.rename(opath + ".tmp", opath)
                order_files.append(opath)
                pages_fetched += len(urls)
                wave_log.append(
                    {
                        "wave": wave,
                        "strategy": strategy,
                        "urls": len(urls),
                        "sec": round(time.perf_counter() - tw, 4),
                        "pipeline_sec": round(t_write - tw, 4),
                        "fixup_sec": round(t_fixup - t_write, 4),
                        "conflicts": len(conflicts),
                    }
                )
                if wave % cfg.checkpoint_every == 0:
                    self._checkpoint(wave, wave_log)
                wave += 1

            except Exception as err:
                # actor-loss recovery (VERDICT r4 item 5): a dead
                # frontier/dedup shard surfaces as RayActorError — from
                # a driver RPC directly, or wrapped in a RayTaskError /
                # Dataset execution error from inside a stage task.
                # Probe-and-recover is authoritative: if no shard is
                # actually dead, this was a different failure — re-raise.
                # First: cancel + drain this wave's sibling chunk tasks
                # so orphans can't keep staging claims / offers / part
                # files against the state the recovery rewinds (the
                # fleet is also fully recreated, which fences any task
                # cancellation misses at the actor boundary).
                if inflight:
                    for r in inflight:
                        try:
                            ray.cancel(r, force=True)
                        except Exception:
                            pass
                    ray.wait(inflight, num_returns=len(inflight), timeout=10)
                    inflight = []
                if recoveries >= 3 or not self._recover_from_actor_loss():
                    raise
                recoveries += 1
                start_wave, wave_log, order_files, pages_fetched = \
                    self._init_run_state(resume=True)
                wave = start_wave
                empty_streak = 0
                # stage closures hold handles to the dead fleet
                fetch_fn, parse_fn, imgfetch_fn, decode_fn = \
                    self._build_stage_fns()
                fns_ref = None
                continue
        self._join_checkpoint()  # final checkpoint durable before return
        elapsed = time.perf_counter() - t0
        fstats = ray.get([s.stats.remote() for s in self.shards])
        agg = {}
        for st in fstats:
            for k, v in st.items():
                if k == "max_host_queue":
                    agg[k] = max(agg.get(k, 0), v)
                else:
                    agg[k] = agg.get(k, 0) + v
        result = CrawlResult(
            waves=wave - start_wave,
            output_dir=cfg.output_dir,
            wave_log=wave_log,
            order_files=order_files,
            stats={
                "elapsed_sec": elapsed,
                "pages_fetched": pages_fetched,
                "pages_per_sec": pages_fetched / elapsed if elapsed > 0 else 0.0,
                "frontier": agg,
                "frontier_ops": agg.get("offered", 0) + agg.get("popped", 0),
                "last_wave_dataset_stats": last_wave_stats[:4000],
                "frontier_ops_per_sec": (
                    (agg.get("offered", 0) + agg.get("popped", 0)) / elapsed
                    if elapsed > 0
                    else 0.0
                ),
            },
        )
        if collect_seen_ids and self.seen_mode == "exact":
            # test/verification mode ONLY: gathering the full seen set to
            # the driver is O(pages) memory — the golden suite's
            # set-equality check, never the production path
            seen = set()
            for items in ray.get([s.seen_items.remote() for s in self.shards]):
                seen.update(items)
            result.stats["seen_ids"] = seen
        return result


def _loser_ords(
    conflicts: list[tuple[int, list[int]]]
) -> tuple[set[int], set[int]]:
    """Resolve multi-claim conflicts to loser ord sets.

    ``conflicts``: per conflicted hash, (namespace, kept claimant ords)
    as reported by the DedupShards — namespace 0 = imgvisit URL claims,
    1 = pixel-hash claims. Winner = minimum ord (the row the sequential
    oracle would have produced first). Rules:

    1. imgvisit losers forfeit their whole claim — content doc AND
       image row (the oracle skips the claim entirely); both rows share
       the claim's ord, so "drop every row with a full-loser ord".
    2. pixel losers forfeit only the image row (the oracle always
       appends the doc) — among claimants still alive after rule 1.
    """
    full_losers: set[int] = set()
    for ns, ords in conflicts:
        if ns == 0:
            w = min(ords)
            full_losers.update(o for o in ords if o != w)
    img_losers: set[int] = set()
    for ns, ords in conflicts:
        if ns == 1:
            alive = [o for o in ords if o not in full_losers]
            if len(alive) >= 2:
                w = min(alive)
                img_losers.update(o for o in alive if o != w)
    return full_losers, img_losers


def _write_tombstones(
    wave_dir: str, full_loser_ords: set[int], img_loser_ords: set[int]
) -> None:
    """Record conflict-loser rows as a per-wave tombstone sidecar
    instead of rewriting parquet files.

    Loser rows are O(conflicts) (~tens per wave) but scatter across
    many block files whose payloads include image bytes — rewriting
    them cost seconds per wave. The sidecar is O(conflicts) bytes,
    written atomically; ``load_unified`` (the single read choke point
    every consumer goes through) applies it as a vectorized filter.
    A re-run of the wave replaces the whole directory, sidecar
    included, so resume semantics are unchanged."""
    payload = {
        "full": sorted(full_loser_ords),
        "img": sorted(img_loser_ords),
    }
    path = os.path.join(wave_dir, "_tombstones.json")
    with open(path + ".tmp", "w") as f:
        json.dump(payload, f)
    os.replace(path + ".tmp", path)


def run_crawl(corpus: CorpusData, cfg: CrawlConfig | None = None,
              seen_mode: str = "exact", resume: bool = False,
              max_waves: int | None = None,
              collect_seen_ids: bool = False) -> CrawlResult:
    engine = CrawlEngine(corpus, cfg, seen_mode)
    return engine.run(resume=resume, max_waves=max_waves,
                      collect_seen_ids=collect_seen_ids)


def load_unified(output_dir: str, columns: list[str] | None = None):
    """Read all wave partitions back as one Dataset, applying each
    wave's conflict-loser tombstones (written by ``_write_tombstones``)
    as a vectorized filter — consumers never see loser rows.

    ``columns`` prunes the read (pass it whenever the consumer doesn't
    need the image ``bytes`` — a full-width read ships MBs of pixels
    per row through the object store for nothing). The tombstone filter
    needs ``wave``/``ord``/``kind`` internally; they're read regardless
    and projected back out before returning."""
    import glob

    files = sorted(glob.glob(os.path.join(output_dir, "wave=*", "*.parquet")))
    read_cols = None
    if columns is not None:
        read_cols = list(dict.fromkeys([*columns, "wave", "ord", "kind"]))
    ds = ray.data.read_parquet(files, columns=read_cols)
    tombs: dict[int, tuple] = {}
    import numpy as np

    for tpath in glob.glob(os.path.join(output_dir, "wave=*", "_tombstones.json")):
        with open(tpath) as f:
            payload = json.load(f)
        w = int(os.path.basename(os.path.dirname(tpath)).split("=")[1])
        tombs[w] = (
            np.array(payload["full"], dtype=np.int64),
            np.array(payload["img"], dtype=np.int64),
        )
    if not tombs:
        if columns is not None:
            return ds.map_batches(
                lambda t: t.select(columns), batch_format="pyarrow"
            )
        return ds
    t_ref = ray.put(tombs)

    def drop_tombstoned(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tb = ray.get(t_ref)
        waves = pc.fill_null(t.column("wave"), -1).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        ords = pc.fill_null(t.column("ord"), -1).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        mask = np.zeros(len(ords), dtype=bool)
        is_image = None
        for w in np.unique(waves):
            ent = tb.get(int(w))
            if ent is None:
                continue
            fl, il = ent
            inw = waves == w
            mask |= inw & np.isin(ords, fl)
            if len(il):
                if is_image is None:
                    is_image = pc.fill_null(
                        pc.equal(t.column("kind"), "image"), False
                    ).to_numpy(zero_copy_only=False)
                mask |= inw & np.isin(ords, il) & is_image
        if mask.any():
            t = t.filter(pa.array(~mask))
        if columns is not None:
            t = t.select(columns)
        return t

    return ds.map_batches(drop_tombstoned, batch_format="pyarrow")


def load_images(output_dir: str):
    """The images table (BASELINE.json input_hint projection) from a
    crawl output dir — column-pruned at the read."""
    from ..core.schemas import IMAGES_COLUMNS

    ds = load_unified(output_dir)
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), "image")).select(
            IMAGES_COLUMNS
        ),
        batch_format="pyarrow",
    )


def consolidate_images(output_dir: str, dest: str | None = None) -> str:
    """Write the final standalone images table (exactly the input_hint
    schema) to ``<output_dir>/images/`` — the artifact a downstream
    training pipeline consumes without knowing about waves. Streaming:
    one pruned pass over the wave partitions."""
    dest = dest or os.path.join(output_dir, "images")
    shutil.rmtree(dest, ignore_errors=True)
    load_images(output_dir).write_parquet(dest)
    return dest
