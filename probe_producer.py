"""Host-producer CPU breakdown for the 7-task wallclock batch build.

The r5 bench proved the wallclock overlap ceiling is the 1-core host
(joint7_producer_cpu_ms 291.6 ~= joint7_device_step_ms 290.2). This probe
cProfiles the exact producer path bench_joint_wallclock runs (same TSVs,
same specs, same loader) to record WHERE that CPU goes — evidence for the
"host producer" remaining-candidate note. Usage: python probe_producer.py
(host-only; no TPU dispatches).
"""

import base64
import cProfile
import io
import os
import pstats
import tempfile
import time


def main():
    from PIL import Image, ImageDraw

    from musketeer_tpu.tasks import MusketeerDataLoader, SubTaskSpec
    from musketeer_tpu.tokenization import default_vocab

    v = default_vocab()
    img_size, B, n_rows = 480, 2, 24
    img = Image.new("RGB", (640, 480), (40, 80, 120))
    d = ImageDraw.Draw(img)
    for k in range(12):
        d.rectangle([20 + 45 * k, 30 + 20 * k, 120 + 45 * k, 180 + 20 * k],
                    fill=(200 - 10 * k, 30 + 15 * k, 60))
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=85)
    b64 = base64.urlsafe_b64encode(buf.getvalue()).decode()

    tmp = tempfile.mkdtemp()

    def tsv(name, rows):
        p = os.path.join(tmp, f"{name}.tsv")
        with open(p, "w") as f:
            for r in rows:
                f.write("\t".join(r) + "\n")
        return p

    paths = {
        "caption": tsv("caption", [
            [str(i), b64, f"a set of colored rectangles number {i}"]
            for i in range(n_rows)
        ]),
        "refcoco": tsv("refcoco", [
            [str(i), b64, "the leftmost rectangle", "20.0,30.0,120.0,180.0"]
            for i in range(n_rows)
        ]),
        "vqa_gen": tsv("vqa_gen", [
            [str(i), b64, "how many rectangles are there", "1.0|!+twelve"]
            for i in range(n_rows)
        ]),
        "snli_ve": tsv("snli_ve", [
            [str(i), b64, "there are shapes", "colored rectangles", "entailment"]
            for i in range(n_rows)
        ]),
        "image_classify": tsv("image_classify", [
            [str(i), b64, "abacus"] for i in range(n_rows)
        ]),
        "gigaword": tsv("gigaword", [
            ["the stock market rose sharply today after unexpected news "
             "about interest rates and employment figures", "market rises"]
            for _ in range(n_rows)
        ]),
        "cola": tsv("cola", [
            [f"the model number {i} runs fine", "1"] for i in range(n_rows)
        ]),
    }
    vision_kw = {"patch_image_size": img_size}
    specs = [
        SubTaskSpec("caption", paths["caption"], batch_size=B,
                    src_len=24, tgt_len=16,
                    sample_patch_num=min(196, (img_size // 16) ** 2),
                    task_kwargs=vision_kw),
        SubTaskSpec("refcoco", paths["refcoco"], batch_size=B,
                    src_len=24, tgt_len=8, task_kwargs=vision_kw),
        SubTaskSpec("vqa_gen", paths["vqa_gen"], batch_size=B,
                    src_len=32, tgt_len=40,
                    task_kwargs={**vision_kw,
                                 "answers": ["twelve", "eleven", "ten"]}),
        SubTaskSpec("snli_ve", paths["snli_ve"], batch_size=B,
                    src_len=40, tgt_len=48, task_kwargs=vision_kw),
        SubTaskSpec("image_classify", paths["image_classify"],
                    batch_size=B, src_len=16, tgt_len=8,
                    task_kwargs={**vision_kw,
                                 "answers": ["abacus", "zebra", "kite"]}),
        SubTaskSpec("gigaword", paths["gigaword"], batch_size=B,
                    src_len=64, tgt_len=16),
        SubTaskSpec("cola", paths["cola"], batch_size=B,
                    src_len=24, tgt_len=32),
    ]
    loader = MusketeerDataLoader(v, specs, description="tep")

    # warm: builder/trie init + caches
    loader.set_epoch(1)
    it = loader.epoch_iterator()
    for i, _ in enumerate(it):
        if i >= 2:
            break

    # timed + profiled steady-state builds
    loader.set_epoch(2)
    it = loader.epoch_iterator()
    n = 8
    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.enable()
    for i, _ in enumerate(it):
        if i >= n - 1:
            break
    pr.disable()
    dt = (time.perf_counter() - t0) / n
    print(f"warm batch build: {dt * 1000:.1f} ms/batch over {n} builds\n")
    st = pstats.Stats(pr)
    st.sort_stats("cumulative")
    print("== top cumulative ==")
    st.print_stats(18)
    st.sort_stats("tottime")
    print("== top self-time ==")
    st.print_stats(18)


if __name__ == "__main__":
    main()
