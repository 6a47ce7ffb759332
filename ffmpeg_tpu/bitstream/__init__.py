from .bits import BitReader, BitWriter, nal_escape, nal_unescape, split_annexb
from .cabac import CabacDecoder, CabacEncoder, ContextTable
