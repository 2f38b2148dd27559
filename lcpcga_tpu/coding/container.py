"""Single-file bitstream container.

Byte-aligned replacement for the reference's ``bitstream``-package
container (/root/reference/model/model.py:214-315 — which converts the
whole stream through a Python string of '0'/'1' characters; SURVEY.md
#21 flags it as notably slow). Identical logical layout:

  header: z length (shape), payload lengths, per-scale true point
  counts k1..k3; payloads: latent-coordinate stream, y stream, z stream.

Little-endian struct packing; magic + version for forward evolution.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import List

MAGIC = b"LCPT"
VERSION = 1


@dataclasses.dataclass
class Bitstream:
    z_length: int            # number of coded z rows ("shape")
    k: List[int]             # true point counts at strides [4, 2, 1]
    points_payload: bytes    # lossless latent coordinate stream (octree)
    y_payload: bytes
    z_payload: bytes

    def to_bytes(self) -> bytes:
        head = struct.pack(
            "<4sBIIIIIII",
            MAGIC,
            VERSION,
            self.z_length,
            len(self.points_payload),
            len(self.y_payload),
            len(self.z_payload),
            self.k[0],
            self.k[1],
            self.k[2],
        )
        return head + self.points_payload + self.y_payload + self.z_payload

    @classmethod
    def from_bytes(cls, data: bytes) -> "Bitstream":
        head_size = struct.calcsize("<4sBIIIIIII")
        magic, version, zlen, lp, ly, lz, k1, k2, k3 = struct.unpack(
            "<4sBIIIIIII", data[:head_size]
        )
        if magic != MAGIC:
            raise ValueError("not a lcpcga bitstream")
        if version != VERSION:
            raise ValueError(f"unsupported bitstream version {version}")
        o = head_size
        points = data[o : o + lp]
        o += lp
        y = data[o : o + ly]
        o += ly
        z = data[o : o + lz]
        return cls(z_length=zlen, k=[k1, k2, k3], points_payload=points,
                   y_payload=y, z_payload=z)

    def save(self, path: str) -> int:
        blob = self.to_bytes()
        with open(path, "wb") as f:
            f.write(blob)
        return len(blob)

    @classmethod
    def load(cls, path: str) -> "Bitstream":
        with open(path, "rb") as f:
            return cls.from_bytes(f.read())
