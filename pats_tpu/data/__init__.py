"""Host input pipeline: datasets deliver uint8 HWC images + camera data.

Like the reference (datasets/*.py), no normalization happens here - the
models normalize internally.  Coordinate convention is (row, col); metrics
flip to (x, y).
"""

from pats_tpu.data.pairs import parse_pair_line
from pats_tpu.data.scannet import ScannetPairs
from pats_tpu.data.yfcc import YfccPairs
from pats_tpu.data.megadepth import MegaDepthPairs
from pats_tpu.data.video import VideoFrames
