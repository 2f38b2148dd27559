from .container import Bitstream
from .native import octree_decode, octree_encode, rans_decode, rans_encode

__all__ = ["Bitstream", "octree_decode", "octree_encode", "rans_decode", "rans_encode"]
