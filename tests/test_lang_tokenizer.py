"""ClipBPETokenizer pinned against a hand-computed toy vocab (VERDICT r3
item #4): merge algorithm, byte-encoder edge cases, lowercasing/whitespace
cleanup, SOT/EOT wrapping + padding/truncation, decode — so the first real
`bpe_simple_vocab_16e6.txt.gz` drop exercises tested code. Interface parity
with the HashTokenizer stand-in is pinned alongside.

Reference algorithm: the CLIP tokenizer used by the X-Decoder text tower
(reference third_party/X-Decoder/xdecoder/modeling/language/LangEncoder/
transformer.py + the public CLIP simple_tokenizer semantics).
"""

import gzip

import numpy as np
import pytest

from geopurify_tpu.models.lang import ClipBPETokenizer, HashTokenizer

# toy merges file: version header + 3 merge rules (rank order matters)
TOY_MERGES = "#version: 0.2\nh e\nl o</w>\nhe l\n"


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    p = tmp_path_factory.mktemp("bpe") / "toy_vocab.txt.gz"
    with gzip.open(p, "wt", encoding="utf-8") as f:
        f.write(TOY_MERGES)
    return ClipBPETokenizer(str(p), context_length=8)


def test_vocab_layout(tok):
    # 256 byte symbols + 256 '</w>' variants + 3 merged symbols + SOT/EOT
    assert tok.vocab_size == 256 * 2 + 3 + 2
    # merged symbols take ids in merge-rank order after the byte pages
    assert tok.encoder["he"] == 512
    assert tok.encoder["lo</w>"] == 513
    assert tok.encoder["hel"] == 514
    assert tok.sot == 515 and tok.eot == 516


def test_byte_encoder_is_gpt2_mapping(tok):
    # printable ascii maps to itself; the famous space -> 'Ġ'; high bytes
    # keep their latin-1 glyph when in the direct ranges
    assert tok.byte_encoder[ord("h")] == "h"
    assert tok.byte_encoder[32] == "Ġ"          # 'Ġ'
    assert tok.byte_encoder[0xC3] == "Ã"
    assert tok.byte_encoder[0xA9] == "©"
    # id of a byte symbol == its position in the bs enumeration:
    # 33..126 (94), 161..172 (12), 174..255 (82), then the remapped rest
    assert tok.encoder["h"] == ord("h") - 33                      # 71
    assert tok.encoder["Ã"] == 94 + 12 + (0xC3 - 174)             # 127
    assert tok.encoder["©"] == 94 + (0xA9 - 161)                  # 102
    assert tok.encoder["©</w>"] == 256 + 102


def test_bpe_merge_sequence(tok):
    """Hand-derived merge walk for 'hello':
    (h,e,l,l,o</w>) -> rank0 (h,e) -> (he,l,l,o</w>)
                    -> rank1 (l,o</w>) merges the SECOND l -> (he,l,lo</w>)
                    -> rank2 (he,l) -> (hel, lo</w>)."""
    assert tok._bpe("hello") == "hel lo</w>"
    assert tok.encode("hello") == [514, 513]


def test_unmerged_and_single_char(tok):
    # no applicable merges: per-byte symbols, last carries </w>
    assert tok.encode("eh") == [tok.encoder["e"], tok.encoder["h</w>"]]
    # single char goes straight to its </w> page
    assert tok.encode("x") == [tok.encoder["x</w>"]]


def test_utf8_bytes(tok):
    # 'é' = 0xC3 0xA9 -> 'Ã' + '©</w>' (no merges apply)
    assert tok.encode("é") == [127, 256 + 102]


def test_cleanup_lowercase_and_pattern(tok):
    # lowercasing + whitespace collapse, then the CLIP regex splits words,
    # digits, and the 's contraction separately
    assert tok.encode("  HeLLo\n\thello ") == [514, 513, 514, 513]
    its = tok.encode("it's")
    assert its == [
        tok.encoder["i"], tok.encoder["t</w>"],
        tok.encoder["'"], tok.encoder["s</w>"],
    ]
    # digits are SEPARATE regex matches ([\p{N}]): each one is its own
    # word-final token, so both carry the </w> page
    assert tok.encode("42") == [tok.encoder["4</w>"], tok.encoder["2</w>"]]


def test_call_wraps_pads_truncates(tok):
    ids, mask = tok(["hello", "hello hello hello hello"])
    assert ids.shape == (2, 8) and mask.shape == (2, 8)
    np.testing.assert_array_equal(ids[0], [515, 514, 513, 516, 0, 0, 0, 0])
    np.testing.assert_array_equal(mask[0], [1, 1, 1, 1, 0, 0, 0, 0])
    # 4 words = 8 tokens -> truncated to L-2=6 body tokens + SOT/EOT
    np.testing.assert_array_equal(ids[1], [515, 514, 513, 514, 513, 514, 513, 516])
    assert mask[1].sum() == 8
    # EOT position == argmax over ids (the pooling position contract,
    # reference vlpencoder.py:149-151)
    assert ids[0].argmax() == 3 and ids[1].argmax() == 7


def test_decode_roundtrip(tok):
    ids, _ = tok(["hello hello"])
    assert tok.decode(ids[0]) == "hello hello"
    assert tok.decode([515, 127, 256 + 102, 516]) == "é"


def test_hash_tokenizer_same_interface():
    h = HashTokenizer(context_length=8)
    ids, mask = h(["hello world", "x"])
    assert ids.shape == (2, 8) and mask.shape == (2, 8)
    # SOT first, EOT at argmax (the text-pooling contract)
    assert (ids[:, 0] == h.sot).all()
    assert ids[0].argmax() == np.where(ids[0] == h.eot)[0][0]
    # deterministic
    ids2, _ = h(["hello world", "x"])
    np.testing.assert_array_equal(ids, ids2)
