"""Flax model zoo: the student affinity network, the X-Decoder 2D VLM teacher
(FocalNet backbone, FPN pixel decoder, masked-attention query decoder, CLIP-style
language encoder), and the Sonata-style 3D SSL teacher."""
