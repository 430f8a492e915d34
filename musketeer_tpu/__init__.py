"""musketeer_tpu — a TPU-native JAX/XLA/Pallas framework with the capabilities of
amazon-science/musketeer (jointly-trained, fully-parameter-shared seq2seq
vision-language model driven by Task Explanation Prompts).

The reference (/root/reference) is PyTorch+fairseq; this is a ground-up
re-design for TPU: pure functional jitted programs, mesh-sharded via
jax.sharding, Pallas kernels on the hot paths.

Layering (mirrors SURVEY.md §1, rebuilt TPU-first):
  tokenization/  GPT-2 BPE + extended dictionary     (ref: utils/BPE, tasks/ofa_task.py:93-116)
  models/        OFA unified transformer + ResNet    (ref: models/ofa/*)
  ops/           attention / CE kernels (XLA+Pallas)
  generation/    jitted constrained beam search      (ref: models/sequence_generator.py)
  data/          TSV datasets + TEP prompt builders  (ref: data/*)
  tasks/         per-task train/eval logic           (ref: tasks/*)
  criterions/    losses                              (ref: criterions/*)
  training/      train state, step fn, checkpoints   (ref: trainer.py, train.py)
  parallel/      mesh + sharding rules               (ref: fairseq DDP/FSDP config)
  utils/         tries, metrics (CIDEr, ...), misc   (ref: utils/*)
"""

__version__ = "0.1.0"
