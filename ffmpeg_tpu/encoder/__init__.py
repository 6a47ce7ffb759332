"""VVC test-pattern encoder.

Generates conforming H.266 bitstreams with chosen (usually random) legal
syntax — splits, intra modes, coefficient levels — plus an "intent"
sidecar recording every choice.  Serves as the framework's encoder
component and as the conformance fixture generator: streams are decoded
by the reference decoder to produce golden frame hashes, and the intent
is compared against our parser's output.
"""
from .encoder import EncoderConfig, encode_stream
