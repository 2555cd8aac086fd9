"""Paged KV cache: device-resident pages + host-side page allocator.

The TPU analog of vLLM's block manager (SURVEY.md §2.2): K/V for all live
sequences share one pool of fixed-size pages per layer; each sequence owns a
page table. The device arrays have static shapes — growth is a host-side
page-table update, never a reallocation — so every jitted step function
compiles once.

Device layout (per cache):
  k / v: num_layers-TUPLE of [KV_heads, num_pages * page_size, head_dim]
  arrays (flat slot axis; the paged-attention kernel reshapes to pages for
  free). Per-layer leaves — not a stacked [L, ...] array — are the load-
  bearing choice: the decode chunk threads the cache through a while_loop
  and donates it through jit, and XLA's in-place buffer elision works
  per-leaf. A stacked cache forced a full-cache unstack/restack HBM round
  trip on every chunk (measured: the dominant continuous-decode cost at
  large pools, PERF.md round 1).

Host side:
  PageAllocator — free list + per-sequence page tables,
  slot mapping helpers — logical position -> physical flat slot.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dots_ocr_tpu.models.config import DecoderConfig


class PagedKV(NamedTuple):
    """Device-side paged cache: per-layer tuples of arrays.

    Optionally int8-quantized (k/v int8 + per-(head, slot) f32 scales):
    halves cache HBM + page-fetch bandwidth — REQUIRED to fit the
    reference's full workload envelope (14.4k vision + 24k decode tokens per
    sequence at 16 slots would need ~19 GB in bf16). Scales are None in
    bf16 mode.
    """

    k: tuple  # L-tuple of [KV, num_pages * page_size, D] (bf16 or int8)
    v: tuple
    # Scales are FLAT per layer ([KV * N_slots]): a [KV, N] layout lets
    # XLA pick a transposed tiling whose (2 -> 128)-lane padding blows the
    # arrays up 64x in HBM.
    k_scale: "tuple | None" = None
    v_scale: "tuple | None" = None

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def num_layers(self) -> int:
        return len(self.k)

    @staticmethod
    def create(
        cfg: DecoderConfig,
        num_pages: int,
        page_size: int,
        dtype=jnp.bfloat16,
        quantized: bool = False,
        kv_replication: int = 1,
    ) -> "PagedKV":
        """``kv_replication`` pads the KV-head axis to
        ``num_kv_heads * kv_replication`` with each head repeated
        ``kv_replication`` times CONTIGUOUSLY (Megatron-style GQA
        replication): on a TP mesh whose model axis exceeds the KV head
        count (e.g. 2 KV heads on model=4) the padded axis shards
        cleanly, each chip holds one replica, and the contiguous
        repetition keeps the kernels' ``q_head // (H // KV)`` group
        mapping pointing at the right data. Writers detect the factor
        from the pool shape and repeat incoming K/V."""
        kv_w = cfg.num_kv_heads * kv_replication
        shape = (kv_w, num_pages * page_size, cfg.head_dim)
        layers = range(cfg.num_layers)
        if quantized:
            scale_shape = (kv_w * num_pages * page_size,)
            return PagedKV(
                tuple(jnp.zeros(shape, jnp.int8) for _ in layers),
                tuple(jnp.zeros(shape, jnp.int8) for _ in layers),
                tuple(jnp.zeros(scale_shape, jnp.float32) for _ in layers),
                tuple(jnp.zeros(scale_shape, jnp.float32) for _ in layers),
            )
        return PagedKV(
            tuple(jnp.zeros(shape, dtype) for _ in layers),
            tuple(jnp.zeros(shape, dtype) for _ in layers),
        )


def quantize_kv(x: jnp.ndarray) -> tuple:
    """Per-vector symmetric int8 quantization over the last (head_dim) axis.

    x: [..., D] -> (int8 [..., D], scale f32 [...]) with x ~= int8 * scale.
    """
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


class OutOfPages(RuntimeError):
    """No free pages: the scheduler must defer admission or preempt."""


@dataclass
class PageAllocator:
    """Host-side page bookkeeping. Page 0 is reserved as the null page
    (padding slots in page tables point at it)."""

    num_pages: int
    page_size: int
    max_pages_per_seq: int
    _free: List[int] = field(default_factory=list)
    _tables: Dict[int, List[int]] = field(default_factory=dict)
    _lengths: Dict[int, int] = field(default_factory=dict)

    def __post_init__(self):
        self._free = list(range(self.num_pages - 1, 0, -1))  # page 0 reserved

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def pages_needed(self, num_tokens: int) -> int:
        return -(-num_tokens // self.page_size)

    def can_allocate(self, num_tokens: int) -> bool:
        return self.pages_needed(num_tokens) <= len(self._free)

    def allocate(self, seq_id: int, num_tokens: int) -> List[int]:
        """Create a sequence with capacity for num_tokens."""
        assert seq_id not in self._tables, f"seq {seq_id} already allocated"
        need = self.pages_needed(num_tokens)
        if need > self.max_pages_per_seq:
            raise OutOfPages(
                f"sequence needs {need} pages > max_pages_per_seq "
                f"{self.max_pages_per_seq}"
            )
        if need > len(self._free):
            raise OutOfPages(f"need {need} pages, {len(self._free)} free")
        pages = [self._free.pop() for _ in range(need)]
        self._tables[seq_id] = pages
        self._lengths[seq_id] = num_tokens
        return pages

    def extend(self, seq_id: int, new_length: int) -> None:
        """Grow a sequence to new_length tokens, appending pages as needed."""
        table = self._tables[seq_id]
        need = self.pages_needed(new_length)
        if need > self.max_pages_per_seq:
            raise OutOfPages(f"sequence exceeds max_pages_per_seq at {new_length}")
        while len(table) < need:
            if not self._free:
                raise OutOfPages("no free pages to extend sequence")
            table.append(self._free.pop())
        self._lengths[seq_id] = new_length

    def trim(self, seq_id: int, new_length: int) -> None:
        """Release lookahead-reservation tail pages beyond new_length tokens.

        Shrink-only (a no-op unless the table holds more pages than
        new_length needs). Callers must never pass new_length below the
        tokens actually written — this exists so the scheduler can drop a
        stale pipelined-`ahead` reservation back to the true position
        after a mid-pass drain (ADVICE r4)."""
        table = self._tables.get(seq_id)
        if table is None:
            return
        need = max(1, self.pages_needed(new_length))
        if need >= len(table):
            return
        while len(table) > need:
            self._free.append(table.pop())
        self._lengths[seq_id] = new_length

    def free(self, seq_id: int) -> None:
        pages = self._tables.pop(seq_id, [])
        self._lengths.pop(seq_id, None)
        self._free.extend(reversed(pages))

    def page_table(self, seq_id: int) -> List[int]:
        return self._tables[seq_id]

    def length(self, seq_id: int) -> int:
        return self._lengths[seq_id]

    def padded_table(self, seq_id: int) -> np.ndarray:
        """Page table padded to max_pages_per_seq with the null page."""
        out = np.zeros(self.max_pages_per_seq, np.int32)
        table = self._tables[seq_id]
        out[: len(table)] = table
        return out

    def slot_mapping(self, seq_id: int, start: int, count: int) -> np.ndarray:
        """Physical flat slots for logical positions [start, start+count)."""
        table = self._tables[seq_id]
        pos = np.arange(start, start + count)
        return (
            np.asarray(table, np.int64)[pos // self.page_size] * self.page_size
            + pos % self.page_size
        ).astype(np.int32)


# ---------------------------------------------------------------------------
# Device-side cache writes (jit-friendly pure functions)
# ---------------------------------------------------------------------------


def scatter_pool_rows(pool: jnp.ndarray, slots: jnp.ndarray,
                      updates: jnp.ndarray) -> jnp.ndarray:
    """Scatter token rows into a [KV, N, D] pool leaf via its flat
    [KV*N, D] row view. Same layout rationale as
    ``models.decoder.scatter_kv_rows`` (which takes token-major updates):
    a middle-axis scatter makes XLA pick a {2,0,1:T(2,128)} result layout
    that the Pallas paged-attention call then converts back with a 16.8 MB
    copy per leaf; the 2-D row scatter keeps the default layout end to end.

    updates: [KV, T, D] (head-major, matching this module's callers).
    """
    kv, n, d = pool.shape
    rows = (
        jnp.arange(kv, dtype=slots.dtype)[:, None] * n + slots[None, :]
    ).reshape(-1)
    upd = updates.reshape(-1, d).astype(pool.dtype)
    return pool.reshape(kv * n, d).at[rows].set(upd).reshape(kv, n, d)


def write_prefill_kv(
    paged: PagedKV, k_new: jnp.ndarray, v_new: jnp.ndarray, slot_mapping: jnp.ndarray
) -> PagedKV:
    """Scatter prefill K/V into pages (quantizing when the cache is int8).

    k_new/v_new: [L, B, T, KV, D] (from decoder_prefill); slot_mapping:
    [B*T] int32 physical slots (-1 entries write to the reserved null page's
    slot 0 region — callers pass padded tokens there).
    """
    num_layers, batch, t, kv_heads, head_dim = k_new.shape
    rep = paged.k[0].shape[0] // kv_heads  # KV-head replication (TP pad)
    if rep > 1:
        k_new = jnp.repeat(k_new, rep, axis=3)
        v_new = jnp.repeat(v_new, rep, axis=3)
        kv_heads *= rep
    flat_k = k_new.transpose(0, 3, 1, 2, 4).reshape(
        num_layers, kv_heads, batch * t, head_dim
    )
    flat_v = v_new.transpose(0, 3, 1, 2, 4).reshape(
        num_layers, kv_heads, batch * t, head_dim
    )
    slots = jnp.maximum(slot_mapping, 0)
    if paged.quantized:
        qk, sk = quantize_kv(flat_k)  # sk: [L, KV, B*T]
        qv, sv = quantize_kv(flat_v)
        n_slots = paged.k[0].shape[1]
        # Flat scale indices: head * N + slot, identical per layer.
        flat_idx = (
            jnp.arange(kv_heads)[:, None] * n_slots + slots[None, :]
        ).reshape(-1)
        return PagedKV(
            tuple(
                scatter_pool_rows(paged.k[l], slots, qk[l])
                for l in range(num_layers)
            ),
            tuple(
                scatter_pool_rows(paged.v[l], slots, qv[l])
                for l in range(num_layers)
            ),
            tuple(
                paged.k_scale[l].at[flat_idx].set(sk[l].reshape(-1))
                for l in range(num_layers)
            ),
            tuple(
                paged.v_scale[l].at[flat_idx].set(sv[l].reshape(-1))
                for l in range(num_layers)
            ),
        )
    return PagedKV(
        tuple(
            scatter_pool_rows(paged.k[l], slots, flat_k[l])
            for l in range(num_layers)
        ),
        tuple(
            scatter_pool_rows(paged.v[l], slots, flat_v[l])
            for l in range(num_layers)
        ),
    )


# (Per-token decode writes happen inline in decoder_decode_step_paged so the
# scatters stay on that function's per-layer carry leaves.)
