"""Continuous-batching scheduler over the paged PQ cache.

New capability relative to the reference (which serves exactly one request
at a time through HF generate, SURVEY.md §2.3): a slot-based scheduler in
the vLLM style — admit requests into free slots, allocate pages on demand,
run one batched `paged_decode_step` for all active slots per tick, retire
finished sequences and recycle their pages.

Host/device split: page-capacity and completion decisions are host-side
(they need the sampled tokens anyway); all compute and cache state stay on
device. Sampled tokens are read back once per tick.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from million_tpu.cache.paged_pq_cache import (
    PagedPQCacheConfig,
    allocate_pages,
    free_sequence,
    init_paged_state,
)
from million_tpu.models.llama import ModelConfig, Params
from million_tpu.models.paged_decode import paged_decode_step, paged_prefill_seq
from million_tpu.runtime.sampling import SamplingConfig, sample


@dataclasses.dataclass
class Request:
    rid: int
    prompt: np.ndarray  # (n,) int32
    max_new_tokens: int
    eos_id: Optional[int] = None


@dataclasses.dataclass
class FinishedRequest:
    rid: int
    tokens: np.ndarray  # generated ids
    prompt_len: int


class Scheduler:
    def __init__(
        self,
        params: Params,
        cfg: ModelConfig,
        pcfg: PagedPQCacheConfig,
        tables: Dict[str, jax.Array],
        sampling: SamplingConfig = SamplingConfig(),
        seed: int = 0,
    ):
        self.params = params
        self.cfg = cfg
        self.pcfg = pcfg
        self.tables = tables
        self.sampling = sampling
        self.state = init_paged_state(pcfg)
        self.key = jax.random.PRNGKey(seed)
        S = pcfg.max_seqs
        self.slot_req: List[Optional[Request]] = [None] * S
        self.slot_generated: List[List[int]] = [[] for _ in range(S)]
        self.slot_pos = np.zeros(S, np.int64)  # absolute position of next token
        self.slot_pages = np.zeros(S, np.int64)  # host mirror of seq_n_pages
        self.slot_codes = np.zeros(S, np.int64)  # host mirror of n_codes
        self.slot_r = np.zeros(S, np.int64)
        self.last_token = jnp.zeros((S,), jnp.int32)
        self.waiting: List[Request] = []
        self.finished: List[FinishedRequest] = []

    # ---------------- admission -----------------------------------------
    def submit(self, req: Request) -> None:
        self.waiting.append(req)

    def _free_slot(self) -> Optional[int]:
        for i, r in enumerate(self.slot_req):
            if r is None:
                return i
        return None

    def _pages_for(self, n_tokens: int) -> int:
        return -(-n_tokens // self.pcfg.page_size)

    def _try_admit(self) -> None:
        while self.waiting:
            slot = self._free_slot()
            if slot is None:
                return
            req = self.waiting[0]
            n = len(req.prompt)
            # pages for prompt + all future flushes + Lt headroom for the
            # decode path's unconditional window mirror
            worst = n + req.max_new_tokens + self.pcfg.Lt
            need = self._pages_for(worst)
            free_pages = self.pcfg.n_pages - int(np.asarray(self.state["used"]).sum())
            if need > min(free_pages, self.pcfg.pages_per_seq):
                return  # head-of-line blocking until pages free up
            self.waiting.pop(0)
            sid = jnp.asarray(slot)
            self.state = allocate_pages(self.state, sid, need)
            ids = jnp.asarray(req.prompt[None, :], jnp.int32)
            logits, self.state = paged_prefill_seq(
                self.params, self.cfg, self.pcfg, sid, ids, self.state, self.tables
            )
            self.key, sk = jax.random.split(self.key)
            tok = sample(logits, sk, self.sampling)  # (1,)
            self.slot_req[slot] = req
            self.slot_generated[slot] = [int(np.asarray(tok[0]))]
            self.slot_pos[slot] = n
            self.slot_pages[slot] = need
            self.slot_codes[slot] = n
            self.slot_r[slot] = 0
            self.last_token = self.last_token.at[slot].set(tok[0])

    # ---------------- one decode tick ------------------------------------
    def step(self) -> int:
        """Admit what fits, then decode one token for every active slot.
        Returns the number of active slots that advanced."""
        self._try_admit()
        active = [i for i, r in enumerate(self.slot_req) if r is not None]
        if not active:
            return 0

        positions = jnp.asarray(self.slot_pos, jnp.int32)
        logits, self.state = paged_decode_step(
            self.params, self.cfg, self.pcfg,
            self.last_token, positions, self.state, self.tables,
        )
        self.key, sk = jax.random.split(self.key)
        toks = sample(logits, sk, self.sampling)  # (S,)
        toks_np = np.asarray(toks)

        for i in active:
            self.slot_pos[i] += 1
            self.slot_r[i] += 1
            if self.slot_r[i] >= self.pcfg.Lt:  # flush happens NEXT step
                self.slot_codes[i] += self.pcfg.Lt
                self.slot_r[i] = 0
            tok = int(toks_np[i])
            self.slot_generated[i].append(tok)
            req = self.slot_req[i]
            done = len(self.slot_generated[i]) >= req.max_new_tokens or (
                req.eos_id is not None and tok == req.eos_id
            )
            if done:
                self._retire(i)
        self.last_token = toks
        return len(active)

    def _retire(self, slot: int) -> None:
        req = self.slot_req[slot]
        self.finished.append(
            FinishedRequest(
                rid=req.rid,
                tokens=np.asarray(self.slot_generated[slot], np.int32),
                prompt_len=len(req.prompt),
            )
        )
        self.state = free_sequence(self.state, jnp.asarray(slot))
        self.slot_req[slot] = None
        self.slot_generated[slot] = []
        self.slot_pos[slot] = 0
        self.slot_pages[slot] = 0
        self.slot_codes[slot] = 0
        self.slot_r[slot] = 0

    def stats(self) -> Dict:
        """Serving observability: pool/slot state plus queue depths — the
        reference's get_cache_stats/print_performance_summary role
        (paged_pq_utils.py:898-1078) for the continuous-batching runtime."""
        from million_tpu.cache.paged_pq_cache import paged_cache_stats

        s = paged_cache_stats(self.state, self.pcfg)
        s["waiting_requests"] = len(self.waiting)
        s["finished_requests"] = len(self.finished)
        s["in_flight"] = sum(r is not None for r in self.slot_req)
        return s

    def run_to_completion(self, max_ticks: int = 100000) -> List[FinishedRequest]:
        ticks = 0
        while (self.waiting or any(r is not None for r in self.slot_req)) and ticks < max_ticks:
            advanced = self.step()
            ticks += 1
            if advanced == 0 and self.waiting:
                raise RuntimeError(
                    "scheduler stalled: waiting requests but nothing admissible "
                    "(pool too small for the smallest request?)"
                )
        return self.finished
