"""CLIP BPE tokenizer: differential test vs the reference SimpleTokenizer
(reference core/model/backbone/tokenizer/tokenizer.py) on plain, accented,
multilingual, and punctuation-heavy strings — and proof the framework is
standalone (vendored vocab, no /root/reference path involved).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.parity  # executing-torch tier (opt-in: -m parity)

torch = pytest.importorskip("torch")

import _refload
from libcontinual_tpu.models import tokenizer as mytok

STRINGS = [
    "a photo of a cat",
    "the quick brown fox jumps over the lazy dog!",
    "café crème brûlée à la façon niçoise",
    "naïve résumé coöperation Zürich",
    "ñandú piñata jalapeño",
    "Ärger Übermut Größe weiß",
    "hello,   world...   multiple   spaces",
    "numbers 123 456.789 and symbols #@$%&*",
    "CamelCase MiXeD CaSe WORDS lower",
    "don't can't won't it's o'clock",
]


@pytest.fixture(scope="module")
def pair():
    vocab = mytok.default_vocab_paths()[1]
    assert os.path.exists(vocab), "vendored vocab missing"
    assert "/root/reference" not in vocab
    ref_tok_mod = _refload.ref_module(
        "core.model.backbone.tokenizer.tokenizer")
    ref = ref_tok_mod.SimpleTokenizer(bpe_path=vocab)
    mine = mytok.SimpleTokenizer(bpe_path=vocab)
    return ref, mine


def test_encode_matches_reference(pair):
    ref, mine = pair
    for s in STRINGS:
        assert mine.encode(s) == ref.encode(s), f"encode mismatch on {s!r}"


def test_tokenize_array_matches_reference(pair):
    ref, mine = pair
    # reference names its specials <start_of_text>/<end_of_text>
    # (tokenizer.py:74); the ids (49406/49407) are what must agree
    sot, eot = ref.encoder["<start_of_text>"], ref.encoder["<end_of_text>"]
    got = mytok.tokenize(STRINGS)
    for i, s in enumerate(STRINGS):
        ids = [sot] + ref.encode(s) + [eot]
        ids = ids[:77]
        want = np.zeros((77,), np.int64)
        want[: len(ids)] = ids
        np.testing.assert_array_equal(np.asarray(got[i]), want,
                                      err_msg=f"tokenize mismatch on {s!r}")


def test_vendored_vocab_loads_by_default():
    t = mytok.SimpleTokenizer()
    assert len(t.encoder) == mytok.VOCAB_SIZE
