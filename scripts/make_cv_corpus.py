"""Generate an ESC-50-SHAPED wav corpus for the milestone-scale `cv` proof
(round-4 VERDICT item 5): 50 classes x 40 clips x 5 s = 2000 wavs with an
ESC-50-convention metadata CSV (filename,fold,target,category — folds
1..5 round-robin), single-label class-coded tones over noise
(data/synthetic.synth_waveforms signatures, so config-1's 200-step budget
can actually learn them).

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/make_cv_corpus.py \
        [out_dir=workspace/cv_corpus_esc50]

Then run the protocol on-chip:

    python -m mla_tpu cv --config=esc50_single_attention \
        --wav_dir=workspace/cv_corpus_esc50/audio \
        --labels_csv=workspace/cv_corpus_esc50/meta.csv
"""

import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mla_tpu.data.audio_io import write_wav  # noqa: E402
from mla_tpu.data.labels import ESC50_LABELS  # noqa: E402
from mla_tpu.data.synthetic import class_frequency  # noqa: E402

N_CLASSES = 50
PER_CLASS = 40
SECONDS = 5.0
SR = 16000


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "workspace/cv_corpus_esc50"
    audio = os.path.join(out, "audio")
    os.makedirs(audio, exist_ok=True)
    rng = np.random.default_rng(0)
    n = int(SECONDS * SR)
    t = np.arange(n) / SR
    rows = []
    for k in range(N_CLASSES):
        f0 = class_frequency(k, N_CLASSES)
        for j in range(PER_CLASS):
            wav = 0.05 * rng.standard_normal(n)
            wav += (rng.uniform(0.2, 0.5)
                    * np.sin(2 * np.pi * f0 * t + rng.uniform(0, 2 * np.pi)))
            fold = j % 5 + 1  # ESC-50 convention: folds 1..5
            fn = f"{fold}-{k:02d}-{j:02d}.wav"
            write_wav(os.path.join(audio, fn), wav.astype(np.float32), SR)
            rows.append((fn, fold, k, ESC50_LABELS[k]))
    with open(os.path.join(out, "meta.csv"), "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["filename", "fold", "target", "category"])
        w.writerows(rows)
    print(f"{len(rows)} clips -> {audio}; meta -> {out}/meta.csv")


if __name__ == "__main__":
    main()
