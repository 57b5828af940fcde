"""AudioLogger — periodic sample generation during training.

Capability parity with main.py's ImageLogger/AudioLogger (main.py:354-527):
every `every_n_steps`, generate from fixed captions (or reconstruct the
current batch), render mel figures (melvmin/melvmax -5/1.5), vocode to wav,
and write everything under <logdir>/audio/step_XXXX/.

Host-side and fully decoupled from the jitted train step.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np


class AudioLogger:
    def __init__(self, logdir: str, every_n_steps: int = 5000,
                 sample_rate: int = 16000, max_items: int = 8,
                 melvmin: float = -5.0, melvmax: float = 1.5,
                 steps: int = 25, guidance_scale: float = 5.0):
        self.logdir = os.path.join(logdir, "audio")
        self.every = every_n_steps
        self.sample_rate = sample_rate
        self.max_items = max_items
        self.melvmin, self.melvmax = melvmin, melvmax
        self.steps = steps
        self.scale = guidance_scale

    def should_log(self, step: int) -> bool:
        return self.every > 0 and step > 0 and step % self.every == 0

    def _save_mel_png(self, mel: np.ndarray, path: str) -> None:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            fig, ax = plt.subplots(figsize=(10, 3))
            ax.imshow(mel, origin="lower", aspect="auto",
                      vmin=self.melvmin, vmax=self.melvmax, cmap="magma")
            ax.set_xlabel("frames")
            ax.set_ylabel("mel")
            fig.tight_layout()
            fig.savefig(path, dpi=80)
            plt.close(fig)
        except Exception as e:
            print(f"AudioLogger: mel plot failed ({e})")

    def log_samples(self, system, step: int, captions: List[dict],
                    key, vocode: bool = True) -> Optional[str]:
        """Generate from captions with the CURRENT system params and dump
        mel npy + png (+ wav). Returns the output dir."""
        import jax
        from scipy.io import wavfile

        outdir = os.path.join(self.logdir, f"step_{step:08d}")
        os.makedirs(outdir, exist_ok=True)
        captions = captions[: self.max_items]
        n = len(captions)
        uc = system.get_learned_conditioning(
            {"ori_caption": [""] * n, "struct_caption": [""] * n})
        c = system.get_learned_conditioning(
            {"ori_caption": [x["ori_caption"] for x in captions],
             "struct_caption": [x["struct_caption"] for x in captions]})
        z = system.sample_cfg(c, self.scale, uc, key, timesteps=self.steps)
        mel = np.asarray(system.decode_first_stage(z))
        wav = system.vocode(mel) if vocode and "vocoder" in system.params else None
        for i, cap in enumerate(captions):
            stem = os.path.join(outdir, f"{i:02d}")
            np.save(stem + "_mel.npy", mel[i])
            self._save_mel_png(mel[i], stem + "_mel.png")
            with open(stem + "_caption.txt", "w") as f:
                f.write(cap["ori_caption"] + "\n")
            if wav is not None:
                wavfile.write(stem + ".wav", self.sample_rate,
                              (np.clip(wav[i], -1, 1) * 32767).astype(np.int16))
        print(f"AudioLogger: wrote {n} samples -> {outdir}")
        return outdir
