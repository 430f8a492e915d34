"""Image-gen task: code generation structure + VQGAN/CLIP-free eval path."""

import jax
import jax.numpy as jnp
import numpy as np

from musketeer_tpu.models import ofa
from musketeer_tpu.tasks.image_gen import ImageGenTask
from musketeer_tpu.tokenization import default_vocab
from tests.test_model import tiny_cfg


def test_generate_codes_structure(tmp_path):
    vocab = default_vocab()
    cfg = tiny_cfg(vocab_size=59457, padded_vocab_size=59520, code_image_size=32)
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    # tiny grid: code_image_size=32 → generation grid 32//16 = 2 → 4 codes
    task = ImageGenTask(vocab, description="base", code_image_size=32)
    src = jnp.asarray(
        np.random.RandomState(0).randint(4, 50000, (2, 8)), jnp.int32
    )
    codes, scores = task.generate_codes(params, cfg, src)
    assert codes.shape == (2, 5, 2, 2)
    c = np.asarray(codes)
    assert (c >= 0).all() and (c < vocab.code_dict_size).all()


def test_image_gen_eval_without_weights(tmp_path):
    vocab = default_vocab()
    cfg = tiny_cfg(vocab_size=59457, padded_vocab_size=59520, code_image_size=32)
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    task = ImageGenTask(vocab, description="base", code_image_size=32)

    p = tmp_path / "gen.tsv"
    rows = []
    rng = np.random.RandomState(1)
    for i in range(2):
        codes = " ".join(str(c) for c in rng.randint(0, 8192, 4))
        rows.append(f"{i}\ta small red cube {i}\t{codes}")
    p.write_text("\n".join(rows) + "\n")
    from musketeer_tpu.data import FileDataset

    out = task.evaluate(params, cfg, FileDataset(str(p)), batch_size=2)
    assert "code_token_acc" in out and out["n"] == 2
    assert "ti_sim" not in out  # no CLIP weights supplied
