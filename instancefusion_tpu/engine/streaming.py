"""Active-window block streaming: HBM <-> host DRAM.

The reference bounds map growth with surfel culling and a time-windowed
active/inactive model split (SURVEY.md §6 "long-context": the map — not a
sequence — is the long axis here).  On TPU the analog is explicit
capacity management: HBM holds only the **active window** of voxel blocks
around the camera; cold blocks stream to host DRAM and stream back when
the camera returns.  This keeps `table_capacity` (and with it every
per-frame top_k/compaction) bounded by the *local* scene complexity
instead of the whole building.

Division of labor:

- Device side (`ops/blocks.partition_window` / `admit_rows`): compaction
  and slot bookkeeping under jit, with a bounded eviction buffer so a
  streaming tick never pulls the full table over PCIe/tunnel.
- Host side (this module): a plain-numpy store keyed by flat block id,
  plus the policy (what radius, when to admit).

Invariant: a block lives on device XOR in the store (admission removes it
from the store; eviction inserts it).  Re-admitted payloads are
bit-identical to what was evicted.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from instancefusion_tpu.config import TsdfConfig
from instancefusion_tpu.ops import blocks as blk


@functools.partial(jax.jit, static_argnums=(1, 3, 5))
def _partition_jit(bm, cfg, center_w, radius, votes, evict_cap, stamp=None):
    return blk.partition_window(
        bm, cfg, center_w, radius, evict_cap, votes, stamp
    )


@functools.partial(jax.jit, static_argnums=(1,))
def _admit_jit(
    bm, cfg, coords, sdf, weight, color, valid, votes, label, count,
    stamp=None, row_stamp=None,
):
    return blk.admit_rows(
        bm, cfg, coords, sdf, weight, color, valid, votes, label, count,
        stamp, row_stamp,
    )


class BlockStreamer:
    """Host-DRAM block store + streaming policy.

    Call `tick(volume, votes, T_wc)` at a low cadence (the pipeline wires
    `stream_every`); it admits stored blocks that re-entered the window,
    then evicts live blocks that left it.  Returns the updated
    (volume, votes) plus a stats dict for metrics.
    """

    def __init__(
        self,
        cfg: TsdfConfig,
        radius: float,
        evict_cap: int = 1024,
        admit_cap: int = 1024,
        with_color: bool = True,
        with_votes: bool = False,
        with_stamps: bool = False,
    ):
        self.cfg = cfg
        self.radius = float(radius)
        self.evict_cap = int(evict_cap)
        self.admit_cap = int(admit_cap)
        self.with_color = with_color
        self.with_votes = with_votes
        self.with_stamps = with_stamps
        # flat block id -> dict of numpy rows
        self.store: dict[int, dict[str, np.ndarray]] = {}
        b3 = cfg.block_size**3
        self._zero = {
            "coords": np.full((3,), -1, np.int32),
            "sdf": np.full((b3,), blk.UNOBSERVED, np.float32),
            "weight": np.zeros((b3,), np.float32),
        }
        if with_color:
            # Packed [r | g | b] channel-segmented rows (blocks.BlockMap).
            self._zero["color"] = np.zeros((3 * b3,), np.float32)
        if with_votes:
            self._zero["label"] = np.full((b3,), -1, np.int32)
            self._zero["count"] = np.zeros((b3,), np.float32)
        if with_stamps:
            self._zero["stamp"] = np.zeros((2,), np.int32)

    def _centers(self, flat_ids: np.ndarray) -> np.ndarray:
        nb = blk.num_blocks_per_axis(self.cfg)
        bsz = self.cfg.block_size * self.cfg.voxel_size
        coords = np.stack(
            [flat_ids // (nb * nb), (flat_ids // nb) % nb, flat_ids % nb], axis=-1
        )
        return np.asarray(self.cfg.origin) + (coords + 0.5) * bsz

    def admit(self, volume, votes, center_w: np.ndarray, stamp=None):
        """Move stored blocks whose center is inside the window to device."""
        if not self.store:
            return volume, votes, stamp, 0
        ids = np.fromiter(self.store.keys(), dtype=np.int64)
        dist = np.linalg.norm(self._centers(ids) - center_w[None, :], axis=-1)
        hot = ids[dist <= self.radius][: self.admit_cap]
        if hot.size == 0:
            return volume, votes, stamp, 0
        rows = [self.store.pop(int(i)) for i in hot]
        n = self.admit_cap

        def batch(key):
            out = np.stack([r[key] for r in rows])
            pad = np.broadcast_to(self._zero[key], (n - len(rows),) + self._zero[key].shape)
            return jnp.asarray(np.concatenate([out, pad], axis=0))

        valid = jnp.asarray(
            np.concatenate([np.ones(len(rows), bool), np.zeros(n - len(rows), bool)])
        )
        out = self._admit_call(volume, votes, batch, valid, stamp)
        if stamp is not None:
            volume, votes, fits, stamp = out
        else:
            volume, votes, fits = out
        # Blocks that didn't fit (capacity) go back to the store.
        fits_np = np.asarray(fits)[: len(rows)]
        for i, r in enumerate(rows):
            if not fits_np[i]:
                self.store[int(hot[i])] = r
        return volume, votes, stamp, int(fits_np.sum())

    def _admit_call(self, volume, votes, batch, valid, stamp):
        """Device half of admission (overridden by the sharded streamer)."""
        return _admit_jit(
            volume, self.cfg, batch("coords"), batch("sdf"), batch("weight"),
            batch("color") if self.with_color else None, valid, votes,
            batch("label") if self.with_votes else None,
            batch("count") if self.with_votes else None,
            stamp,
            batch("stamp") if (stamp is not None and self.with_stamps) else None,
        )

    def _evict_call(self, volume, votes, center_w, stamp):
        """Device half of eviction (overridden by the sharded streamer)."""
        return _partition_jit(
            volume, self.cfg, jnp.asarray(center_w, jnp.float32),
            self.radius, votes, self.evict_cap, stamp,
        )

    def evict(self, volume, votes, center_w: np.ndarray, stamp=None):
        """Move live blocks outside the window to the host store."""
        out = self._evict_call(volume, votes, center_w, stamp)
        if stamp is not None:
            volume, votes_new, ev, stamp = out
        else:
            volume, votes_new, ev = out
        ev = jax.device_get(ev)
        nb = blk.num_blocks_per_axis(self.cfg)
        n_out = 0
        for i in range(ev["valid"].shape[0]):
            if not ev["valid"][i]:
                continue
            cxyz = ev["coords"][i]
            fid = int((cxyz[0] * nb + cxyz[1]) * nb + cxyz[2])
            row = {
                "coords": ev["coords"][i],
                "sdf": ev["sdf"][i],
                "weight": ev["weight"][i],
            }
            if self.with_color:
                row["color"] = ev["color"][i]
            if self.with_votes:
                row["label"] = ev["label"][i]
                row["count"] = ev["count"][i]
            if self.with_stamps and "stamp" in ev:
                row["stamp"] = ev["stamp"][i]
            self.store[fid] = row
            n_out += 1
        return volume, (votes_new if votes is not None else votes), stamp, n_out

    def save(self, path: str) -> None:
        """Persist the host store (step alongside the device checkpoint).

        The device⊻store invariant means evicted blocks exist ONLY here —
        without this, resume after any eviction silently loses them
        (r3 VERDICT Weak #2).
        """
        ids = np.fromiter(self.store.keys(), np.int64, count=len(self.store))
        payload = {"ids": ids}
        for key, zero in self._zero.items():
            if len(ids):
                payload[key] = np.stack(
                    [self.store[int(i)][key] for i in ids]
                )
            else:
                payload[key] = np.zeros((0,) + zero.shape, zero.dtype)
        np.savez_compressed(path, **payload)

    def load(self, path: str) -> None:
        """Restore a store written by `save` (replaces the current one)."""
        data = np.load(path)
        ids = data["ids"]
        self.store = {
            int(ids[i]): {key: data[key][i] for key in self._zero}
            for i in range(len(ids))
        }

    def tick(self, volume, votes, T_wc, stamp=None):
        """One streaming step: admit re-entering blocks, evict cold ones."""
        center = np.asarray(T_wc)[:3, 3]
        volume, votes, stamp, n_in = self.admit(volume, votes, center, stamp)
        volume, votes, stamp, n_out = self.evict(volume, votes, center, stamp)
        return volume, votes, stamp, {
            "stream_in": n_in,
            "stream_out": n_out,
            "stored_blocks": len(self.store),
        }


class ShardedBlockStreamer(BlockStreamer):
    """Block streaming for the slab-sharded map (configs 4/5).

    Same host store, save/load format, and tick policy as the
    single-chip streamer; only the device halves change — eviction
    compacts each shard's own cold rows (parallel/shard.partition_window,
    [S*evict_cap] bounded pull), admission appends each row on its slab
    owner (shard.admit_rows, cuts ownership).  Stamps are a single-shard
    feature (the sharded engine tracks none).
    """

    def __init__(self, cfg, mesh, radius: float, evict_cap: int = 1024,
                 admit_cap: int = 1024, with_color: bool = True,
                 with_votes: bool = False):
        super().__init__(
            cfg, radius, evict_cap=evict_cap, admit_cap=admit_cap,
            with_color=with_color, with_votes=with_votes, with_stamps=False,
        )
        from instancefusion_tpu.parallel import shard

        self.mesh = mesh

        def _evict(vol, votes, center):
            return shard.partition_window(
                vol, mesh, cfg, center, self.radius, self.evict_cap, votes
            )

        def _admit(vol, votes, coords, sdf, weight, color, valid, lab, cnt):
            return shard.admit_rows(
                vol, mesh, cfg, coords, sdf, weight, color, valid,
                votes, lab, cnt,
            )

        self._evict_fn = jax.jit(_evict)
        self._admit_fn = jax.jit(_admit)

    def _admit_call(self, volume, votes, batch, valid, stamp):
        assert stamp is None, "sharded streaming has no stamp planes"
        return self._admit_fn(
            volume, votes, batch("coords"), batch("sdf"), batch("weight"),
            batch("color") if self.with_color else None, valid,
            batch("label") if self.with_votes else None,
            batch("count") if self.with_votes else None,
        )

    def _evict_call(self, volume, votes, center_w, stamp):
        assert stamp is None, "sharded streaming has no stamp planes"
        return self._evict_fn(
            volume, votes, jnp.asarray(center_w, jnp.float32)
        )
