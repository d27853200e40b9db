"""Regenerate the full-size random-weight checkpoint fixture.

The parity harness (scripts/parity_real.py, scripts/parity_hf.py,
tests/test_parity_real.py) runs against /tmp/ckpt_full/depth_pro.pt. The
environment has no network egress, so that file is a DEPTH_PRO-scale
random-weight fixture built from the torch mirror (tests/torch_ref.py,
``randomize`` -- same provenance as rounds 1-2, see
docs/PARITY_RESULTS.md). This script recreates it deterministically, plus
a synthetic photo for the e2e runs.

Run: PYTHONPATH=. python scripts/make_fixture_checkpoint.py [out_dir]
(~2 GB written; takes minutes on a slow disk. f16 halves the write cost
without changing what the loaders exercise -- the real checkpoint also
stores f16 -- so f16 is the default.)
"""

import os
import sys


def main(out_dir: str = "/tmp/ckpt_full", seed: int = 0) -> None:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    import numpy as np
    import torch

    import torch_ref
    from matrix_eyes_tpu.config import DEPTH_PRO

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "depth_pro.pt")

    model = torch_ref.DepthPro(DEPTH_PRO)
    torch_ref.randomize(model, seed=seed)
    sd = {k: v.half() for k, v in model.state_dict().items()}
    torch.save(sd, path)
    print(f"wrote {path} ({os.path.getsize(path)/1e9:.2f} GB)")

    # synthetic 12 MP photo (no EXIF focal length -> exercises the FOV head)
    photo = os.path.join(out_dir, "photo.jpg")
    if not os.path.exists(photo):
        from PIL import Image

        rng = np.random.RandomState(seed + 1)
        base = rng.uniform(40, 215, (189, 252, 3))
        img = np.kron(base, np.ones((16, 16, 1)))  # smooth 3024x4032 blocks
        img += rng.uniform(-25, 25, img.shape)  # texture
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
            photo, quality=92)
        print(f"wrote {photo}")


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["/tmp/ckpt_full"]))
