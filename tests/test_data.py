"""Data-layer tests: TSV reader sharding, task example builders, collation."""

import base64
import io

import numpy as np
import pytest
from PIL import Image

from musketeer_tpu.data import (
    CaptionBuilder, FileDataset, GigawordBuilder, GlueBuilder, RefcocoBuilder,
    SnliVeBuilder, VqaBuilder, collate, parse_ref_dict,
)
from musketeer_tpu.generation import DenseTrie
from musketeer_tpu.tokenization import default_vocab


def fake_image_b64(w=64, h=48, color=(200, 30, 30)):
    img = Image.new("RGB", (w, h), color)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.urlsafe_b64encode(buf.getvalue()).decode()


@pytest.fixture(scope="module")
def vocab():
    return default_vocab()


def test_file_dataset_sharding(tmp_path):
    p = tmp_path / "data.tsv"
    rows = [f"id{i}\tcol{i}" for i in range(10)]
    p.write_text("\n".join(rows) + "\n")
    full = FileDataset(str(p))
    assert full.total_row_count == 10
    assert full[3] == ["id3", "col3"]
    s0 = FileDataset(str(p), shard_id=0, num_shards=3)
    s1 = FileDataset(str(p), shard_id=1, num_shards=3)
    s2 = FileDataset(str(p), shard_id=2, num_shards=3)
    assert s0.row_count + s1.row_count + s2.row_count == 10
    seen = {tuple(s[i]) for s in (s0, s1, s2) for i in range(s.row_count)}
    assert len(seen) == 10
    # selected cols + wraparound
    sel = FileDataset(str(p), selected_col_ids=[1])
    assert sel[0] == ["col0"]
    assert sel[10] == ["col0"]


def test_file_dataset_batched_read(tmp_path):
    """get_batch (native one-call path) == per-row __getitem__."""
    p = tmp_path / "batch.tsv"
    rows = [f"id{i}\tpayload-{i}\textra{i}" for i in range(25)]
    p.write_text("\n".join(rows) + "\n")
    ds = FileDataset(str(p), selected_col_ids=[0, 1])
    idx = [0, 24, 7, 7, 3, 30]  # dup + wraparound
    batch = ds.get_batch(idx)
    assert batch == [ds[i] for i in idx]
    assert batch[1] == ["id24", "payload-24"]
    assert batch[-1] == ds[30 % 25]
    assert ds.get_batch([]) == []
    # sharded view maps shard-local indices
    s1 = FileDataset(str(p), shard_id=1, num_shards=3)
    assert s1.get_batch([0, 1]) == [s1[0], s1[1]]


def test_native_batched_rows(tmp_path):
    from musketeer_tpu.native import NativeTsv, available

    if not available():
        pytest.skip("native toolchain unavailable")
    p = tmp_path / "nat.tsv"
    p.write_text("a\tb\n\ncc\tdd\n")  # includes an empty row
    nt = NativeTsv(str(p))
    assert nt.rows([0, 1, 2]) == ["a\tb", "", "cc\tdd"]
    assert nt.rows(np.asarray([2, 0])) == ["cc\tdd", "a\tb"]
    assert nt.rows([]) == []
    with pytest.raises(IndexError):
        nt.rows([0, 99])
    nt.close()


def test_caption_builder(vocab):
    b = CaptionBuilder(vocab, description="tep", split="train", patch_image_size=64)
    ex = b(["42", fake_image_b64(), "A man, riding a horse!"])
    assert ex.patch_image.shape == (64, 64, 3)
    assert ex.src_ids[0] == vocab.bos and ex.src_ids[-1] == vocab.eos
    # punctuation stripped for train target
    text = vocab.decode_ids(ex.target_ids)
    assert "," not in text and "!" not in text
    assert ex.target_ids[-1] == vocab.eos
    assert ex.prev_ids[0] == vocab.bos
    assert np.array_equal(ex.prev_ids[1:], ex.target_ids[:-1])
    # TEP prompt is long
    assert len(ex.src_ids) > 100
    b2 = CaptionBuilder(vocab, description="base", split="train", patch_image_size=64)
    ex2 = b2(["42", fake_image_b64(), "A man riding a horse"])
    assert len(ex2.src_ids) < 12


def test_refcoco_builder(vocab):
    b = RefcocoBuilder(vocab, description="tep", patch_image_size=64, max_image_size=512)
    ex = b(["7", fake_image_b64(64, 48), "the red area", "10.0,12.0,50.0,40.0"])
    # target: 4 bins + eos
    assert len(ex.target_ids) == 5
    assert all(vocab.bin_start <= t < vocab.bin_start + 1000 for t in ex.target_ids[:4])
    assert ex.target_ids[-1] == vocab.eos
    # bin values match manual quantization
    w_r, h_r = ex.extras["w_resize_ratio"], ex.extras["h_resize_ratio"]
    assert w_r == 64 / 64 and h_r == 64 / 48
    expect_x0 = round(10.0 * w_r / 512 * 999)
    assert ex.target_ids[0] - vocab.bin_start == expect_x0


def test_vqa_builder_prev_output(vocab):
    trie = DenseTrie.from_answers(vocab, ["yes", "no", "2"])
    b = VqaBuilder(
        vocab, description="base", prompt_type="prev_output", trie=trie,
        patch_image_size=64,
    )
    ex = b(["9", fake_image_b64(), "how many dogs are there", "0.6|!+2&&0.4|!+3"])
    assert ex.conf == 0.6
    assert ex.extras["ref_dict"] == {"2": 0.6, "3": 0.4}
    # decoder input = src[:-1] + answer; target pads everything but answer span
    ans = vocab.encode_text(" 2")
    assert len(ex.prev_ids) == len(ex.src_ids) - 1 + len(ans)
    n_supervised = int((ex.target_ids != vocab.pad).sum())
    assert n_supervised == len(ans) + 1  # answer + eos
    # constraint mask allows the target at each supervised position
    cm = ex.constraint_mask
    sup = np.nonzero(ex.target_ids != vocab.pad)[0]
    for i in sup:
        assert cm[i, ex.target_ids[i]], i


def test_snli_builder(vocab):
    trie = DenseTrie.from_answers(vocab, ["yes", "no", "maybe"])
    b = SnliVeBuilder(vocab, description="tep", trie=trie, patch_image_size=64)
    ex = b(["3", fake_image_b64(), "a dog runs", "an animal moves", "entailment"])
    assert ex.extras["ref_dict"] == {"yes": 1.0}
    sup = np.nonzero(ex.target_ids != vocab.pad)[0]
    assert len(sup) == len(vocab.encode_text(" yes")) + 1


def test_glue_builders(vocab):
    for task, row in [
        ("cola", ["this sentence good is", "0"]),
        ("sst2", ["a wonderful movie", "1"]),
        ("rte", ["a man eats", "someone is eating", "entailment"]),
        ("mnli", ["a man eats", "nobody eats", "2"]),
    ]:
        b = GlueBuilder(task, vocab, description="base")
        ex = b(row)
        assert ex.patch_image is None
        assert (ex.target_ids != vocab.pad).sum() >= 2


def test_gigaword_builder(vocab):
    b = GigawordBuilder(vocab, description="tep", max_src_length=64, max_tgt_length=16)
    ex = b(["the stock market rose sharply today after news", "market rises"])
    assert ex.patch_image is None
    assert vocab.decode_ids(ex.target_ids) == "market rises"


def test_collate_shapes(vocab):
    b = CaptionBuilder(vocab, description="base", split="train", patch_image_size=32)
    exs = [
        b([str(i), fake_image_b64(), f"a photo of thing {i} with extra words " * (i + 1)])
        for i in range(3)
    ]
    batch = collate(exs, pad_id=vocab.pad, pad_multiple=8)
    assert batch["src_tokens"].shape[0] == 3
    assert batch["src_tokens"].shape[1] % 8 == 0
    assert batch["target"].shape == batch["prev_output_tokens"].shape
    assert batch["patch_images"].shape == (3, 32, 32, 3)
    assert batch["patch_masks"].all()
    assert batch["ntokens"] > 0
