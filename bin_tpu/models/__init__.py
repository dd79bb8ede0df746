"""Model zoo: backbone encoder-decoder, ConvLSTM, BIN pyramid, PRF recurrence."""

from bin_tpu.models.backbone import Backbone
from bin_tpu.models.convlstm import ConvLSTMCell
from bin_tpu.models.pyramid import BINPyramid
from bin_tpu.models import recurrent

__all__ = ["Backbone", "ConvLSTMCell", "BINPyramid", "recurrent"]
