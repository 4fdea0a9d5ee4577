"""Online serving: deadline-based continuous microbatching + HTTP front end.

The reference has no serving system — its closest artifact is the one-shot
merge-and-generate script (script/inference/generate_audio.py:11-59), and
BASELINE config 5 asks for batched multi-LoRA serving. ``ServeEngine``
covers the OFFLINE path (``submit``/``flush`` over a requests file); this
module adds the ONLINE path: concurrent callers submit single requests, a
scheduler thread forms batches — a batch closes when it reaches
``max_batch`` or when its oldest request has waited ``max_delay_ms`` — and
each batch rides the engine's normal bucketed, CFG-folded, merged-cache
dispatch. TPU framing: one chip's s/clip is flat in batch size (PERF.md
serving sweep b=1..8), so batching concurrent requests raises throughput
~linearly while light-load latency only pays the batching window.

Batching semantics:
- Requests are grouped by their generation parameters (steps / seconds /
  guidance / scheduler) — those are compile keys, so different settings
  can never share a device program anyway.
- Unseeded requests share batches; the batch's RNG comes from a monotone
  scheduler counter (deterministic for a fixed arrival grouping, never
  reused across batches — same discipline as ``ServeEngine.flush``).
- A request with an explicit ``seed`` ALSO shares batches: the engine
  draws each row's init latents from a per-request key
  (``ServeEngine._row_keys``), so "same seed -> same waveform" holds
  independently of what else is in flight. The one exception is a seeded
  ``lcm`` request — lcm draws inter-step noise from the batch rng, so it
  is served solo (the old rule, now scoped to the only case needing it).

The HTTP layer is stdlib-only (``http.server``): POST /v1/generate returns
base64 wav, POST /v1/adapters hot-loads a PEFT LoRA into the running bank
(no recompile — the adapter bank writes into a preallocated slot, engine.py
AdapterBank), DELETE /v1/adapters/<name> unloads one, GET /healthz and
/v1/stats for operations. Capacity: ``max_adapters`` bounds the bank; past
it, loads evict the least-recently-served adapter (``load_adapter``).
"""

from __future__ import annotations

import base64
import io
import json
import threading
import time
import urllib.parse
import dataclasses
from collections import deque
from concurrent.futures import Future
from concurrent.futures import TimeoutError as FuturesTimeoutError
from dataclasses import dataclass
from typing import Optional

import numpy as np

from audioldm_tpu.serve.engine import AdapterBank, ServeEngine


@dataclass(frozen=True)
class GenParams:
    """Generation settings that key a compiled program (ServeEngine._fn
    cache key fields, minus the bucket the scheduler doesn't control)."""

    num_inference_steps: int = 50
    audio_length_in_s: float = 10.0
    guidance_scale: float = 2.5
    scheduler: str = "ddim"
    # None -> the engine-level default. A grouping field (not a compile key):
    # the CFG uncond embedding is one shared row per batch, so requests in a
    # batch must agree on it.
    negative_prompt: Optional[str] = None
    # MultiDiffusion windowed long-form denoising (compile-key fields;
    # pipeline/generate.py denoise docstring)
    window_seconds: Optional[float] = None
    window_overlap: float = 0.5
    # limited-interval CFG (compile-key field; denoise docstring): (lo, hi)
    # fractions of the train timestep range, guidance applied only inside
    guidance_interval: Optional[tuple] = None

    def geometry(self) -> tuple:
        """The compile-key fields — everything that selects a distinct XLA
        program. ``negative_prompt`` is a batch-grouping field only (one
        shared uncond row per batch), so it is excluded: any negative
        prompt rides an allowed geometry. ``window_overlap`` is normalized
        to None when windowing is off — the engine ignores it then
        (engine passes window=None), so a request differing only in a
        dangling overlap selects the SAME compiled program and must match
        the same allowlist entry."""
        return (
            self.num_inference_steps, self.audio_length_in_s,
            self.guidance_scale, self.scheduler, self.window_seconds,
            self.window_overlap if self.window_seconds is not None else None,
            self.guidance_interval,
        )

    def validate(self) -> "GenParams":
        """Raise ``ValueError`` for parameter combinations the pipeline
        rejects at trace time (``pipeline/generate.py denoise``). The HTTP
        handler calls this BEFORE submit so a bad request is a 400 at parse
        time, not a server-side exception inside the batch thread — which
        the handler must treat as a 500 (a blanket result-time
        ValueError->400 would reclassify genuine server bugs as client
        errors; round-5 review finding). Conservative by design: anything
        this misses surfaces as a 500, never a wrong 400."""
        if self.num_inference_steps < 1:
            raise ValueError(f"steps must be >= 1, got {self.num_inference_steps}")
        if not self.audio_length_in_s > 0:
            raise ValueError(f"seconds must be > 0, got {self.audio_length_in_s}")
        if self.scheduler not in ("ddim", "dpm++", "lcm"):
            raise ValueError(f"unknown scheduler {self.scheduler!r}; "
                             "one of: ddim, dpm++, lcm")
        if self.window_seconds is not None:
            if not self.window_seconds > 0:
                raise ValueError(f"window_seconds must be > 0, got {self.window_seconds}")
            if not 0.0 <= self.window_overlap < 1.0:
                raise ValueError(f"window_overlap needs 0 <= ov < 1, got {self.window_overlap}")
        if self.guidance_interval is not None:
            if self.scheduler == "lcm":
                raise ValueError("guidance_interval is incompatible with scheduler='lcm' "
                                 "(LCM samples without CFG)")
            if self.window_seconds is not None and self.window_seconds < self.audio_length_in_s:
                # a covering window IS the standard path (pipeline allows it)
                raise ValueError("guidance_interval is incompatible with windowed "
                                 "long-form generation")
        return self


@dataclass
class _Pending:
    prompt: str
    adapter: Optional[str]
    params: GenParams
    seed: Optional[int]
    future: Future
    t_submit: float


class Microbatcher:
    """Single scheduler thread turning concurrent ``submit`` calls into
    engine batches. All engine access (dispatch AND adapter hot-load) is
    serialized through ``_engine_lock`` — jax dispatch itself is
    thread-safe, but the engine's merged/jit caches and the bank pytree
    are plain Python state."""

    def __init__(
        self,
        engine: ServeEngine,
        max_batch: int = 8,
        max_delay_ms: float = 50.0,
        base_seed: int = 0,
        max_adapters: Optional[int] = None,
        geometries: Optional[list] = None,
        defaults: Optional[GenParams] = None,
    ):
        self.engine = engine
        self.max_batch = max_batch
        self.max_delay_ms = max_delay_ms
        self.base_seed = base_seed
        # server-configured generation defaults: the HTTP handler fills
        # request fields ABSENT from the body from here (not from the
        # GenParams dataclass defaults), so an operator who serves
        # non-default flags (`cli serve --steps 25 --geometry default`)
        # doesn't 400 every bare request (round-5 review finding)
        self.defaults = defaults if defaults is not None else GenParams()
        # compile-geometry allowlist (VERDICT round-4 #5): every distinct
        # (steps, seconds, scheduler, window, guidance-interval) combination
        # compiles a NEW device program — minutes on the remote-compiler
        # backend — and an oversized request can HBM-OOM the worker outright
        # (the b=32 probe crashed it once; NOTES environment gotchas). With
        # an allowlist, submit() rejects any request whose GenParams.geometry
        # is not in the set, so arbitrary HTTP traffic can neither trigger
        # serve-path compiles nor probe the memory cliff. None = unrestricted
        # (offline / trusted callers).
        self.geometries: Optional[frozenset] = (
            None if geometries is None
            else frozenset(self._norm_geometry(g) for g in geometries)
        )
        # hot-load capacity policy: loading a NEW adapter past this count
        # (or past the bank's max_capacity) evicts the least-recently-served
        # loaded adapter that no composition references (load_adapter)
        self.max_adapters = max_adapters
        self._adapter_last_used: dict[str, float] = {}
        # adapters referenced by accepted-but-unfinished requests: submit
        # increments, future resolution decrements. Eviction and DELETE must
        # not remove these — a request validated at submit time would fail
        # with an unknown-adapter 500 at serve time (code-review finding).
        self._adapter_inflight: dict[str, int] = {}
        self.batch_sizes: list[int] = []  # observability (tested)
        self.latencies_ms: deque[float] = deque(maxlen=1024)  # submit->result wall
        self.served = 0
        self._pending: deque[_Pending] = deque()
        self._cv = threading.Condition()
        self._engine_lock = threading.Lock()
        self._batch_ordinal = 0
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    @staticmethod
    def _norm_geometry(g) -> tuple:
        """Allowlist entry -> compile-key tuple. ``GenParams`` entries go
        through ``.geometry()``; raw tuples get the SAME normalization
        (dangling ``window_overlap`` -> None when windowing is off) plus a
        length check — an unnormalized raw entry would be dead config no
        request's geometry() can ever match (round-5 review finding)."""
        if isinstance(g, GenParams):
            return g.geometry()
        t = tuple(g)
        want = len(GenParams().geometry())
        if len(t) != want:
            raise ValueError(
                f"geometry entry needs {want} fields (steps, seconds, "
                f"guidance, scheduler, window_seconds, window_overlap, "
                f"guidance_interval), got {t!r}")
        # coerce field types to what GenParams.geometry() emits: a raw
        # entry like ("2", ...) would pass the length check yet never
        # equal any request's geometry (silent dead config), and a
        # list-valued guidance_interval is unhashable — a bare TypeError
        # out of the ctor's frozenset() with no hint which entry is bad
        # (round-5 review finding)
        try:
            gi = None if t[6] is None else tuple(float(x) for x in t[6])
            if gi is not None and len(gi) != 2:
                raise ValueError("guidance_interval expects (lo, hi)")
            t = (int(t[0]), float(t[1]), float(t[2]), str(t[3]),
                 None if t[4] is None else float(t[4]),
                 None if t[5] is None else float(t[5]), gi)
        except (TypeError, ValueError) as e:
            raise ValueError(f"bad geometry entry {t!r}: {e}") from e
        if t[4] is None and t[5] is not None:
            t = t[:5] + (None,) + t[6:]
        return t

    # -- public API ---------------------------------------------------------
    def submit(
        self,
        prompt: str,
        adapter: Optional[str] = None,
        params: GenParams = GenParams(),
        seed: Optional[int] = None,
    ) -> Future:
        """Enqueue one request; the Future resolves to a float32 waveform
        ``[samples]``. Unknown adapters and disallowed geometries fail fast
        here (not mid-batch)."""
        if self.geometries is not None and params.geometry() not in self.geometries:
            # key=repr: the tuples mix None with floats/tuples in the same
            # position (e.g. guidance_interval None vs (0.05, 0.65)), so a
            # plain sorted() would TypeError — turning this 400 into a 500
            # exactly in multi-geometry configs (round-5 review finding)
            raise ValueError(
                f"request geometry {params.geometry()} is not in the served "
                f"allowlist (steps, seconds, guidance, scheduler, window_seconds, "
                f"window_overlap, guidance_interval); allowed: "
                f"{sorted(self.geometries, key=repr)}"
            )
        fut: Future = Future()
        req = _Pending(prompt, adapter, params, seed, fut, time.monotonic())
        with self._cv:
            # adapter validation and the in-flight pin are ATOMIC under _cv:
            # remove_adapter/_evict_for hold _cv across their pin-check AND
            # the engine removal, so a submit can never pin an adapter that
            # a concurrent DELETE/eviction already decided to remove
            # (advisor round-4 TOCTOU finding)
            if not self.engine.has_adapter(adapter):
                bank = self.engine.bank
                have = sorted(bank.names) if bank is not None else []
                raise KeyError(f"unknown adapter {adapter!r}; loaded: "
                               f"{have} composed: {sorted(self.engine.composed)}")
            if not self._running:
                raise RuntimeError("Microbatcher is closed")
            if adapter and adapter != "base":
                self._adapter_inflight[adapter] = self._adapter_inflight.get(adapter, 0) + 1
            self._pending.append(req)
            self._cv.notify()
        return fut

    def _release_inflight(self, r: "_Pending") -> None:
        """Drop the in-flight pin once ``r``'s future is resolved."""
        if not r.adapter or r.adapter == "base":
            return
        with self._cv:
            n = self._adapter_inflight.get(r.adapter, 0) - 1
            if n > 0:
                self._adapter_inflight[r.adapter] = n
            else:
                self._adapter_inflight.pop(r.adapter, None)

    def load_adapter(self, name: str, adapter_tree, rank: int, alpha: Optional[float] = None) -> None:
        """Hot-load (or replace) a LoRA adapter in the running engine.
        Shape-stable: the bank writes into a preallocated slot (donated
        in-place update, O(slot) — AdapterBank.add), so no compiled program
        is invalidated; only the per-adapter merged-cache entry for a
        replaced name is dropped. Loading a NEW name past ``max_adapters``
        (or the bank's ``max_capacity``) first evicts the least-recently-
        served loaded adapter that no composition references; if nothing is
        evictable the load is refused."""
        from audioldm_tpu.config import LoRAConfig

        with self._engine_lock:
            eng = self.engine
            if name in eng.composed:
                raise ValueError(
                    f"adapter name {name!r} is taken by a composed adapter; "
                    "pick another name (compositions are recomputed, not replaced, "
                    "by component loads)"
                )
            if eng.bank is None:
                eng.lora_cfg = LoRAConfig(r=rank, lora_alpha=float(alpha if alpha is not None else rank))
                eng.bank = AdapterBank.from_adapters({name: adapter_tree}, eng.lora_cfg)
            elif rank != eng.bank.rank:
                raise ValueError(
                    f"adapter rank {rank} != bank rank {eng.bank.rank}; "
                    "a bank stacks same-rank adapters (engine.py AdapterBank)"
                )
            else:
                if name not in eng.bank.names:
                    self._evict_for(name)
                eng.bank.add(name, adapter_tree)
            eng._merged_cache.pop(name, None)
            # compositions built from this component would otherwise keep
            # serving the OLD merged weights (code-review finding)
            eng.refresh_composed(name)
            self._adapter_last_used[name] = time.monotonic()

    def _evict_for(self, incoming: str) -> None:
        """Under ``_engine_lock``: free a slot for ``incoming`` if the bank
        is at its capacity policy, evicting the least-recently-served
        adapter that is not a composition component."""
        eng = self.engine
        loaded = len(eng.bank.names) - 1  # minus the reserved base slot
        over_policy = self.max_adapters is not None and loaded >= self.max_adapters
        if not (over_policy or eng.bank.full):
            return
        in_use = {c for w in eng.composed.values() for c in w}
        # hold _cv across the pin check AND the removal: a submit pinning
        # concurrently either lands before (victim is excluded) or blocks on
        # _cv until the bank no longer has the victim and its has_adapter
        # validation fails fast (advisor round-4 TOCTOU finding)
        with self._cv:
            in_use |= {n for n, c in self._adapter_inflight.items() if c > 0}
            candidates = [n for n in eng.bank.names
                          if n != "base" and n != incoming and n not in in_use]
            if not candidates:
                raise ValueError(
                    f"adapter bank is at capacity ({loaded} loaded, "
                    f"max_adapters={self.max_adapters}) and every adapter is "
                    "pinned (a composition component or referenced by in-flight "
                    "requests) — remove a composition or retry later"
                )
            victim = min(candidates, key=lambda n: self._adapter_last_used.get(n, 0.0))
            eng.remove_adapter(victim)
            self._adapter_last_used.pop(victim, None)

    def remove_adapter(self, name: str) -> None:
        """Unload an adapter or composition from the running engine
        (engine.remove_adapter: slot freed + merged cache dropped). Refused
        while accepted requests still reference it — they were validated at
        submit time and must not fail with unknown-adapter at serve time."""
        with self._engine_lock:
            # _cv held across the pin check AND the removal — see _evict_for
            # (advisor round-4 TOCTOU finding)
            with self._cv:
                if self._adapter_inflight.get(name, 0) > 0:
                    raise ValueError(
                        f"adapter {name!r} is referenced by "
                        f"{self._adapter_inflight[name]} in-flight request(s); "
                        "retry after they complete"
                    )
                self.engine.remove_adapter(name)
                self._adapter_last_used.pop(name, None)

    def compose_adapter(self, name: str, weights: dict) -> None:
        """Register a weighted multi-LoRA composition in the running engine
        (engine.add_composed — merged once, then zero-overhead serving)."""
        with self._engine_lock:
            self.engine.add_composed(name, {str(k): float(v) for k, v in weights.items()})

    def close(self, timeout: float = 30.0) -> None:
        """Stop the scheduler after draining already-queued requests."""
        with self._cv:
            self._running = False
            self._cv.notify()
        self._thread.join(timeout)

    def stats(self) -> dict:
        lat = np.asarray(self.latencies_ms, np.float64)
        return {
            "served": self.served,
            "batches": len(self.batch_sizes),
            "mean_batch": float(np.mean(self.batch_sizes)) if self.batch_sizes else 0.0,
            "pending": len(self._pending),
            "adapters": sorted(self.engine.bank.names) if self.engine.bank else ["base"],
            "composed": sorted(self.engine.composed),
            # submit->result wall latency over the last <=1024 requests
            "latency_ms": {
                "p50": round(float(np.percentile(lat, 50)), 1),
                "p95": round(float(np.percentile(lat, 95)), 1),
                "p99": round(float(np.percentile(lat, 99)), 1),
            } if lat.size else None,
        }

    # -- scheduler ------------------------------------------------------------
    def _take_batch(self) -> Optional[list[_Pending]]:
        """Under ``_cv``: pop the next batch, or None to keep waiting.
        The head request anchors the batch: it collects same-params peers
        (seeded or not — per-row latent keys make seeds batch-independent)
        until ``max_batch`` or the head's deadline. Seeded lcm requests are
        the one solo case (inter-step noise rides the batch rng)."""
        if not self._pending:
            return None
        head = self._pending[0]

        def solo(r: _Pending) -> bool:
            return r.seed is not None and r.params.scheduler == "lcm"

        if solo(head):
            self._pending.popleft()
            return [head]
        same = [r for r in self._pending if not solo(r) and r.params == head.params]
        deadline = head.t_submit + self.max_delay_ms / 1000.0
        if len(same) < self.max_batch and time.monotonic() < deadline and self._running:
            # keep waiting for the window to fill (or close by deadline)
            self._cv.wait(timeout=max(0.0, deadline - time.monotonic()))
            return None
        batch = same[: self.max_batch]
        taken = set(map(id, batch))
        self._pending = deque(r for r in self._pending if id(r) not in taken)
        return batch

    def _loop(self) -> None:
        while True:
            with self._cv:
                if not self._running and not self._pending:
                    return
                if not self._pending:
                    self._cv.wait(timeout=0.5)
                batch = self._take_batch()
            if batch:
                self._serve(batch)

    def _batch_rng(self, ordinal: int):
        """Batch rng for unseeded rows: ``fold_in(PRNGKey(base_seed), n)``,
        NOT ``PRNGKey(base_seed + n)``. A raw ``PRNGKey(k)`` batch key would
        make unseeded row 0 (``fold_in(rng, 0)`` in ``ServeEngine._row_keys``)
        bit-identical to a user request seeded with that same small ``k`` —
        and daemon ordinals are small monotone ints, exactly the seeds users
        pick. Folding leaves the ``PRNGKey(k)`` family, so the collision
        needs a 2^-64 key coincidence instead of two small equal ints
        (code-review finding)."""
        import jax

        return jax.random.fold_in(jax.random.PRNGKey(self.base_seed), ordinal)

    def _serve(self, batch: list[_Pending]) -> None:
        p = batch[0].params
        rng_key = None
        if len(batch) == 1 and batch[0].seed is not None and p.scheduler == "lcm":
            # solo seeded lcm: batch-rng reproducibility (docstring rule)
            seed, seeds = batch[0].seed, None
        else:
            seed = 0  # unused: rng_key takes precedence in engine.generate
            rng_key = self._batch_rng(self._batch_ordinal)
            self._batch_ordinal += 1
            # per-request seeds ride per-row latent keys — reproducible
            # inside any shared batch (ServeEngine._row_keys)
            seeds = [r.seed for r in batch] if any(r.seed is not None for r in batch) else None
        try:
            with self._engine_lock:
                wavs = self.engine.generate(
                    [r.prompt for r in batch],
                    adapters=[r.adapter for r in batch],
                    num_inference_steps=p.num_inference_steps,
                    audio_length_in_s=p.audio_length_in_s,
                    guidance_scale=p.guidance_scale,
                    scheduler=p.scheduler,
                    seed=seed,
                    rng_key=rng_key,
                    negative_prompt=p.negative_prompt,
                    window_seconds=p.window_seconds,
                    window_overlap=p.window_overlap,
                    guidance_interval=p.guidance_interval,
                    seeds=seeds,
                )
        except Exception as e:  # noqa: BLE001
            if len(batch) > 1:
                # an unservable COMBINATION (e.g. a composed adapter forced
                # onto the rank-r path under a dp mesh) raises for the whole
                # batch; retry solo so only the offending request fails
                # instead of poisoning innocent co-batched peers
                for r in batch:
                    self._serve([r])
                return
            batch[0].future.set_exception(e)
            self._release_inflight(batch[0])
            return
        self.batch_sizes.append(len(batch))
        self.served += len(batch)
        now = time.monotonic()
        for i, r in enumerate(batch):
            self.latencies_ms.append((now - r.t_submit) * 1e3)
            if r.adapter and r.adapter != "base":
                self._adapter_last_used[r.adapter] = now  # LRU eviction order
            r.future.set_result(wavs[i])
            self._release_inflight(r)


# -- HTTP front end -------------------------------------------------------


def _wav_bytes(waveform: np.ndarray, sample_rate: int) -> bytes:
    from audioldm_tpu.data.wavio import write_wav

    buf = io.BytesIO()
    write_wav(buf, waveform, sample_rate)  # wave.open accepts file objects
    return buf.getvalue()


def make_server(
    batcher: Microbatcher,
    sample_rate: int,
    host: str = "127.0.0.1",
    port: int = 0,
    request_timeout_s: float = 600.0,
):
    """Build a ``ThreadingHTTPServer`` over the batcher. Returns the server;
    call ``serve_forever()`` (blocking) or drive it from a thread. Port 0
    binds an ephemeral port (``server.server_address[1]``)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet; /v1/stats is the observability
            pass

        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _read_body(self) -> dict:
            n = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(n) or b"{}")

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True})
            elif self.path == "/v1/stats":
                self._json(200, batcher.stats())
            elif self.path == "/v1/adapters":
                bank = batcher.engine.bank
                self._json(200, {"adapters": sorted(bank.names) if bank else ["base"],
                                 "composed": sorted(batcher.engine.composed)})
            else:
                self._json(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            try:
                body = self._read_body()
            except (ValueError, json.JSONDecodeError) as e:
                return self._json(400, {"error": f"bad json: {e}"})
            if not isinstance(body, dict):
                # `5`, `null`, or `"a prompt"` are valid JSON but not a
                # request object — without this gate they'd raise
                # (`in`/.get on a non-dict) and drop the connection with
                # no response (round-5 review finding)
                return self._json(400, {"error": "request body must be a JSON object"})
            if self.path == "/v1/generate":
                return self._generate(body)
            if self.path == "/v1/adapters":
                return self._load_adapter(body)
            self._json(404, {"error": f"no route {self.path}"})

        def do_DELETE(self):
            prefix = "/v1/adapters/"
            if not self.path.startswith(prefix) or len(self.path) <= len(prefix):
                return self._json(404, {"error": f"no route {self.path} "
                                        "(DELETE /v1/adapters/<name>)"})
            name = urllib.parse.unquote(self.path[len(prefix):])
            try:
                batcher.remove_adapter(name)
            except KeyError as e:
                return self._json(404, {"error": str(e)})
            except ValueError as e:
                return self._json(409, {"error": str(e)})
            bank = batcher.engine.bank
            self._json(200, {"removed": name,
                             "adapters": sorted(bank.names) if bank else ["base"],
                             "composed": sorted(batcher.engine.composed)})

        def _generate(self, body: dict) -> None:
            if "prompt" not in body:
                return self._json(400, {"error": "missing 'prompt'"})
            gi = body.get("guidance_interval")
            if gi is not None:
                # a str is iterable, so "01" would silently pass as (0.0, 1.0)
                if not isinstance(gi, (list, tuple)) or len(gi) != 2:
                    return self._json(400, {"error": "guidance_interval expects [lo, hi] fractions"})
                try:
                    lo, hi = (float(x) for x in gi)
                except (TypeError, ValueError):
                    return self._json(400, {"error": "guidance_interval expects [lo, hi] fractions"})
                if not 0.0 <= lo <= hi <= 1.0:
                    return self._json(400, {"error": "guidance_interval needs 0 <= lo <= hi <= 1"})
                gi = (lo, hi)
            # fields PRESENT in the body (JSON null counts as absent)
            # override the server-configured defaults (batcher.defaults,
            # set from the serve command's flags); absent fields keep them,
            # so `--geometry default` always matches a bare request even
            # under non-default flags (round-5 review finding). The
            # coercions sit INSIDE the try: a malformed value ({"steps":
            # "fast"}) must be a 400, not an unhandled exception that drops
            # the connection with no response (round-5 review finding).
            try:
                kw = {}
                if body.get("steps") is not None:
                    kw["num_inference_steps"] = int(body["steps"])
                if body.get("seconds") is not None:
                    kw["audio_length_in_s"] = float(body["seconds"])
                if body.get("guidance") is not None:
                    kw["guidance_scale"] = float(body["guidance"])
                if body.get("scheduler") is not None:
                    kw["scheduler"] = str(body["scheduler"])
                if body.get("window_overlap") is not None:
                    kw["window_overlap"] = float(body["window_overlap"])
                if body.get("window_seconds") is not None:
                    kw["window_seconds"] = float(body["window_seconds"])
                if body.get("negative_prompt") is not None:
                    kw["negative_prompt"] = str(body["negative_prompt"])
                if gi is not None:
                    kw["guidance_interval"] = gi
                params = dataclasses.replace(batcher.defaults, **kw).validate()
                seed = body.get("seed")
                seed = None if seed is None else int(seed)
            except (TypeError, ValueError) as e:
                return self._json(400, {"error": f"bad parameter: {type(e).__name__}: {e}"})
            t0 = time.monotonic()
            # submit-time rejections (geometry allowlist, unknown adapter)
            # are the CLIENT's fault -> 400/503. Anything the batch thread
            # raises afterwards arrives via the future and is a SERVER
            # error -> 500: params.validate() above already rejected the
            # known-bad parameter combinations, so a blanket result-time
            # ValueError->400 would only reclassify genuine server bugs as
            # client errors (round-5 review finding).
            try:
                fut = batcher.submit(
                    str(body["prompt"]), body.get("adapter"), params, seed,
                )
            except KeyError as e:
                return self._json(400, {"error": str(e)})
            except ValueError as e:
                return self._json(400, {"error": str(e)})
            except RuntimeError as e:
                # Microbatcher closed (server shutting down)
                return self._json(503, {"error": str(e)})
            try:
                wav = fut.result(timeout=request_timeout_s)
            except FuturesTimeoutError:
                return self._json(504, {"error":
                    f"request did not complete within {request_timeout_s}s"})
            except Exception as e:  # noqa: BLE001 — surface engine errors
                return self._json(500, {"error": f"{type(e).__name__}: {e}"})
            self._json(200, {
                "sample_rate": sample_rate,
                "samples": int(wav.shape[-1]),
                "audio_b64": base64.b64encode(_wav_bytes(wav, sample_rate)).decode(),
                "latency_ms": round((time.monotonic() - t0) * 1e3, 1),
            })

        def _load_adapter(self, body: dict) -> None:
            if "name" not in body or ("path" not in body) == ("compose" not in body):
                return self._json(400, {"error":
                    "need 'name' plus exactly one of 'path' (load a PEFT "
                    "safetensors) or 'compose' ({component: weight} map)"})
            if "compose" in body:
                try:
                    batcher.compose_adapter(body["name"], dict(body["compose"]))
                except (TypeError, ValueError, KeyError) as e:
                    return self._json(400, {"error": f"{type(e).__name__}: {e}"})
                return self._json(200, {"composed": body["name"],
                                        "weights": body["compose"],
                                        "adapters": sorted(batcher.engine.bank.names),
                                        "composed_all": sorted(batcher.engine.composed)})
            from audioldm_tpu.ckpt import load_safetensors
            from audioldm_tpu.lora import import_peft_state_dict

            try:
                tree, rank = import_peft_state_dict(load_safetensors(body["path"]))
                batcher.load_adapter(body["name"], tree, rank, body.get("alpha"))
            except (OSError, ValueError, KeyError) as e:
                return self._json(400, {"error": f"{type(e).__name__}: {e}"})
            self._json(200, {"loaded": body["name"], "rank": rank,
                             "adapters": sorted(batcher.engine.bank.names)})

    return ThreadingHTTPServer((host, port), Handler)
