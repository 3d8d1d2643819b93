"""Serving-session checkpoint / resume.

The reference's checkpoint story is offline artifacts only — sampled-KV
fvecs, trained-centroid files, and an append-only results ledger
(SURVEY.md §5: "No model-state or KV-cache checkpointing",
main_pq.py:171-241). This module goes beyond it: the LIVE serving state —
the paged KV pools (compressed codes + exact residual windows), page
tables, per-slot scheduler bookkeeping, in-flight request metadata, queued
requests, and the sampling RNG — snapshots to one portable `.npz` and
restores into a fresh `Scheduler`, resuming every in-flight generation
mid-stream. With greedy (or any fixed-RNG) sampling the resumed run emits
BIT-IDENTICAL continuations, because everything the decode step reads is
part of the snapshot.

Why npz and not orbax: the state is a flat dict of dense arrays (the
compressed cache is ~4x smaller than the fp16 KV it replaces — that is the
whole point of the framework) and a single-file atomic snapshot keeps the
restore path dependency-light and inspectable. The flat single-stream
cache gets the same treatment (save_cache / load_cache) for
generation-session resume.

Snapshot atomicity: written to `<path>.tmp` then os.replace'd — a crash
mid-save leaves the previous snapshot intact (the failure-recovery
contract a serving checkpoint exists for).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from million_tpu.runtime.scheduler import Request, Scheduler

_META_KEY = "__session_meta__"
_PREFIX_STATE = "state."
_PREFIX_HOST = "host."


def _atomic_savez(path: str, **arrays) -> None:
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


# --------------------------------------------------------------------------
# flat single-stream cache
# --------------------------------------------------------------------------

def save_cache(path: str, cache: Dict[str, jax.Array], pos: int) -> None:
    """Snapshot a flat PQ (or dense) cache pytree plus the absolute position
    of the next token. Everything decode_step reads is included, so a
    restored session continues exactly."""
    arrays = {_PREFIX_STATE + k: np.asarray(v) for k, v in cache.items()}
    arrays[_META_KEY] = np.frombuffer(
        json.dumps({"pos": int(pos), "keys": sorted(cache.keys())}).encode(),
        dtype=np.uint8,
    )
    _atomic_savez(path, **arrays)


def load_cache(path: str) -> Tuple[Dict[str, jax.Array], int]:
    """Inverse of save_cache. Returns (cache pytree on the default device,
    next-token position)."""
    z = np.load(path)
    meta = json.loads(bytes(z[_META_KEY]).decode())
    cache = {
        k: jnp.asarray(z[_PREFIX_STATE + k]) for k in meta["keys"]
    }
    return cache, int(meta["pos"])


# --------------------------------------------------------------------------
# live scheduler session
# --------------------------------------------------------------------------

def save_session(path: str, sched: Scheduler) -> None:
    """Snapshot a live Scheduler: device cache state, host slot mirrors,
    in-flight and queued requests, generated-so-far tokens, and the
    sampling RNG key."""
    # drain the pipelined token readback: in-flight sampled tokens must
    # land in the generated lists before they are serialized
    sched._process_pending()
    arrays = {_PREFIX_STATE + k: np.asarray(v) for k, v in sched.state.items()}
    arrays[_PREFIX_HOST + "slot_pos"] = sched.slot_pos
    arrays[_PREFIX_HOST + "slot_pages"] = sched.slot_pages
    arrays[_PREFIX_HOST + "slot_codes"] = sched.slot_codes
    arrays[_PREFIX_HOST + "slot_r"] = sched.slot_r
    arrays[_PREFIX_HOST + "last_token"] = np.asarray(sched.last_token)
    # PRNG key: handle both typed (new-style) and raw uint32 keys
    typed_key = jnp.issubdtype(sched.key.dtype, jax.dtypes.prng_key)
    arrays[_PREFIX_HOST + "rng_key"] = np.asarray(
        jax.random.key_data(sched.key) if typed_key else sched.key
    )

    def req_dict(r: Request) -> dict:
        return {
            "rid": r.rid,
            "max_new_tokens": r.max_new_tokens,
            "eos_id": r.eos_id,
        }

    slots = []
    for i, r in enumerate(sched.slot_req):
        if r is None:
            slots.append(None)
        else:
            slots.append({**req_dict(r), "generated": sched.slot_generated[i]})
            arrays[f"prompt.slot{i}"] = np.asarray(r.prompt, np.int32)
    waiting = []
    for j, r in enumerate(sched.waiting):
        waiting.append(req_dict(r))
        arrays[f"prompt.wait{j}"] = np.asarray(r.prompt, np.int32)
    finished = [
        {"rid": f.rid, "prompt_len": f.prompt_len} for f in sched.finished
    ]
    for j, f in enumerate(sched.finished):
        arrays[f"tokens.fin{j}"] = np.asarray(f.tokens, np.int32)

    meta = {
        "state_keys": sorted(sched.state.keys()),
        "slots": slots,
        "waiting": waiting,
        "finished": finished,
        "typed_key": bool(typed_key),
        # on-demand paging state: admission order (preemption victim
        # selection) and stashed generated tokens of preempted requests
        "slot_order": list(sched.slot_order),
        "preempt_saved": {
            str(rid): toks for rid, toks in sched._preempt_saved.items()
        },
        "preemptions": sched.preemptions,
    }
    arrays[_META_KEY] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    _atomic_savez(path, **arrays)


def load_session(
    path: str,
    params,
    cfg,
    pcfg,
    tables,
    sampling: Optional[object] = None,
    mesh=None,
) -> Scheduler:
    """Restore a Scheduler saved by save_session. `params`/`cfg`/`pcfg`/
    `tables` are NOT part of the snapshot (weights and codebooks are large,
    immutable, and already on disk as their own artifacts — the reference's
    own resume model, main_pq.py:257-260); they must match the saved run.
    With `mesh`, restores into a ShardedScheduler: state arrays re-place
    with their mesh shardings and the host allocator mirrors (per-shard
    free maps, local-id table) rebuild from the snapshot's device state —
    a session saved on one mesh resumes on any mesh of the same
    (n_sp, tp) geometry.
    """
    from million_tpu.runtime.sampling import SamplingConfig
    from million_tpu.runtime.scheduler import FinishedRequest, ShardedScheduler

    z = np.load(path)
    meta = json.loads(bytes(z[_META_KEY]).decode())

    if mesh is not None:
        sched = ShardedScheduler(
            params, cfg, pcfg, tables, mesh=mesh,
            sampling=sampling if sampling is not None else SamplingConfig(),
        )
    else:
        sched = Scheduler(
            params, cfg, pcfg, tables,
            sampling=sampling if sampling is not None else SamplingConfig(),
        )
    got_keys = sorted(meta["state_keys"])
    want_keys = sorted(sched.state.keys())
    if got_keys != want_keys:
        raise ValueError(
            f"snapshot state keys {got_keys} do not match this build's "
            f"paged state {want_keys} — pcfg/model mismatch?"
        )
    for k in got_keys:
        arr = z[_PREFIX_STATE + k]
        if tuple(arr.shape) != tuple(sched.state[k].shape):
            raise ValueError(
                f"snapshot state[{k}] shape {arr.shape} != configured "
                f"{tuple(sched.state[k].shape)} — pcfg mismatch"
            )
        if mesh is not None:
            sched.state[k] = jax.device_put(arr, sched._shardings[k])
        else:
            sched.state[k] = jnp.asarray(arr)
    if mesh is not None:
        # rebuild the host allocator mirrors from the restored device state
        sched.h_table = z[_PREFIX_STATE + "page_table"].copy()
        sched.h_used = z[_PREFIX_STATE + "used"].astype(bool).copy()
        sched.h_alloc = z[_PREFIX_STATE + "seq_n_pages"].astype(
            np.int64).copy()
    sched.slot_pos = z[_PREFIX_HOST + "slot_pos"].copy()
    sched.slot_pages = z[_PREFIX_HOST + "slot_pages"].copy()
    sched.slot_codes = z[_PREFIX_HOST + "slot_codes"].copy()
    sched.slot_r = z[_PREFIX_HOST + "slot_r"].copy()
    sched.last_token = jnp.asarray(z[_PREFIX_HOST + "last_token"])
    kd = jnp.asarray(z[_PREFIX_HOST + "rng_key"])
    sched.key = jax.random.wrap_key_data(kd) if meta.get("typed_key") else kd

    for i, s in enumerate(meta["slots"]):
        if s is None:
            continue
        sched.slot_req[i] = Request(
            rid=s["rid"],
            prompt=z[f"prompt.slot{i}"],
            max_new_tokens=s["max_new_tokens"],
            eos_id=s["eos_id"],
        )
        sched.slot_generated[i] = list(s["generated"])
        # save_session drains the pipeline first, so dispatched == emitted
        sched.slot_sent[i] = len(sched.slot_generated[i])
    sched.slot_order = [
        int(i) for i in meta.get(
            "slot_order",
            [i for i, sl in enumerate(meta["slots"]) if sl is not None],
        )
    ]
    sched._preempt_saved = {
        int(rid): list(toks)
        for rid, toks in meta.get("preempt_saved", {}).items()
    }
    sched.preemptions = int(meta.get("preemptions", 0))
    sched.waiting = [
        Request(
            rid=w["rid"],
            prompt=z[f"prompt.wait{j}"],
            max_new_tokens=w["max_new_tokens"],
            eos_id=w["eos_id"],
        )
        for j, w in enumerate(meta["waiting"])
    ]
    sched.finished = [
        FinishedRequest(
            rid=f["rid"], tokens=z[f"tokens.fin{j}"], prompt_len=f["prompt_len"]
        )
        for j, f in enumerate(meta["finished"])
    ]
    return sched
