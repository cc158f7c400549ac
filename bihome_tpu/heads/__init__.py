"""Loss heads: supervised passthrough, photometric, triplet, biHomE."""

from bihome_tpu.heads.config import HeadConfig  # noqa: F401
from bihome_tpu.heads.assembled import AssembledModel  # noqa: F401
