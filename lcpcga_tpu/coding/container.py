"""Single-file bitstream container.

Byte-aligned replacement for the reference's ``bitstream``-package
container (/root/reference/model/model.py:214-315 — which converts the
whole stream through a Python string of '0'/'1' characters; SURVEY.md
#21 flags it as notably slow). Same logical layout (z length, payload
lengths, per-scale point counts k1..k3, then the latent-coordinate /
y / z payloads) plus the fields that make the stream SELF-CONTAINED:

  * ``n_points``  — original point count (bpp bookkeeping);
  * ``depth``     — octree depth of the latent-coordinate coder;
  * ``caps``      — the 6-level capacity profile the encoder compiled
                    with. The decoder reconstructs the identical
                    ``Capacities`` from the header, so bytes + weights
                    fully determine the reconstruction (decoder
                    self-sufficiency of /root/reference/model/
                    model.py:267-315 — the reference needs no capacity
                    profile because torch shapes are dynamic).
  * ``q_payload`` — optional second hyperprior stream for the
                    separate-q-model ablation
                    (/root/reference/model/model.py:129-135).

Little-endian struct packing; magic + version for forward evolution.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import List, Tuple

MAGIC = b"LCPT"
VERSION = 3

_HEAD_FMT = "<4sBBB11I6I5B"
_HEAD_SIZE = struct.calcsize(_HEAD_FMT)

_FLAG_SEPARATE_Q = 1


@dataclasses.dataclass
class Bitstream:
    z_length: int            # number of coded z rows ("shape")
    k: List[int]             # true point counts at strides [4, 2, 1]
    points_payload: bytes    # lossless latent coordinate stream (octree)
    y_payload: bytes
    z_payload: bytes
    # Self-containment fields (v2).
    n_points: int = 0        # original cloud size (bpp accounting)
    depth: int = 10          # octree depth at stride 1 (vox10 = 10)
    caps: Tuple[int, ...] = ()   # 6-level capacity profile
    # Remaining Capacities fields (buffer sizing is part of the encoder's
    # compiled program; the decoder must reproduce it or risk overflow).
    # Fractions are fixed-point 1/100, clamped to 2.55.
    cand_factor: int = 18
    tile_pct: int = 62
    same_tile_pct: int = 0
    post_tile_pct: int = 35
    stack_tile: int = 2      # tile size of the same-stride/post stacks
    # separate_q_model ablation: q latent coded by its own hyperprior.
    q_payload: bytes = b""
    qz_payload: bytes = b""
    qz_length: int = 0

    @staticmethod
    def _u8(name: str, v: int) -> int:
        """Capacity-profile fields ride in one byte; wrapping or
        clamping would reconstruct a decoder with SMALLER buffers than
        the encoder compiled with, so fail at encode time instead."""
        if not 0 <= v <= 255:
            raise ValueError(
                f"bitstream header field {name}={v} does not fit in u8; "
                f"capacity profile is not serializable"
            )
        return v

    def to_bytes(self) -> bytes:
        caps = tuple(self.caps) if self.caps else (0,) * 6
        assert len(caps) == 6, caps
        flags = _FLAG_SEPARATE_Q if (self.q_payload or self.qz_payload) else 0
        head = struct.pack(
            _HEAD_FMT,
            MAGIC,
            VERSION,
            flags,
            self.depth,
            self.qz_length,
            self.n_points,
            self.z_length,
            len(self.points_payload),
            len(self.y_payload),
            len(self.z_payload),
            len(self.q_payload),
            len(self.qz_payload),
            self.k[0],
            self.k[1],
            self.k[2],
            *caps,
            self._u8("cand_factor", self.cand_factor),
            self._u8("tile_pct", self.tile_pct),
            self._u8("same_tile_pct", self.same_tile_pct),
            self._u8("post_tile_pct", self.post_tile_pct),
            self._u8("stack_tile", self.stack_tile),
        )
        return (head + self.points_payload + self.y_payload + self.z_payload
                + self.q_payload + self.qz_payload)

    @classmethod
    def from_bytes(cls, data: bytes) -> "Bitstream":
        if len(data) < _HEAD_SIZE:
            raise ValueError(
                f"truncated lcpcga bitstream: {len(data)} bytes < "
                f"{_HEAD_SIZE}-byte header"
            )
        magic, version = struct.unpack("<4sB", data[:5])
        if magic != MAGIC:
            raise ValueError("not a lcpcga bitstream")
        if version != VERSION:
            raise ValueError(f"unsupported bitstream version {version}")
        (_, _, flags, depth, qzlen, n_points, zlen, lp, ly, lz, lq, lqz,
         k1, k2, k3, c0, c1, c2, c3, c4, c5, cand_factor, tile_pct,
         same_tile_pct, post_tile_pct, stack_tile) = struct.unpack(
            _HEAD_FMT, data[:_HEAD_SIZE]
        )
        caps = (c0, c1, c2, c3, c4, c5)
        o = _HEAD_SIZE
        points = data[o: o + lp]
        o += lp
        y = data[o: o + ly]
        o += ly
        z = data[o: o + lz]
        o += lz
        q = data[o: o + lq]
        o += lq
        qz = data[o: o + lqz]
        return cls(
            z_length=zlen,
            k=[k1, k2, k3],
            points_payload=points,
            y_payload=y,
            z_payload=z,
            n_points=n_points,
            depth=depth,
            caps=tuple(caps),
            cand_factor=cand_factor,
            tile_pct=tile_pct,
            same_tile_pct=same_tile_pct,
            post_tile_pct=post_tile_pct,
            stack_tile=stack_tile,
            q_payload=q,
            qz_payload=qz,
            qz_length=qzlen,
        )

    def save(self, path: str) -> int:
        blob = self.to_bytes()
        with open(path, "wb") as f:
            f.write(blob)
        return len(blob)

    @classmethod
    def load(cls, path: str) -> "Bitstream":
        with open(path, "rb") as f:
            return cls.from_bytes(f.read())
