"""Train the Panoptic-DeepLab head on the synthetic scene (dev tool).

Produces the in-repo pretrained checkpoint consumed by
`models.segmentation.load_pretrained` and the config-3 e2e path: a few
hundred optax steps on rendered frames with GT instance targets
(walls remapped to background — only the three objects are "things").

    python _train_seghead.py            # trains + writes the npz
    STEPS=50 python _train_seghead.py   # quick smoke

Output: instancefusion_tpu/models/weights/seghead_synthetic_w16.npz
(float16-packed flax params, ~0.8 MB).
"""
import os

import jax

if os.environ.get("TRAIN_PLATFORM", "cpu"):
    jax.config.update("jax_platforms", os.environ.get("TRAIN_PLATFORM", "cpu"))

import numpy as np
import jax.numpy as jnp
import optax

from instancefusion_tpu.datasets import synthetic
from instancefusion_tpu.geometry.camera import Intrinsics
from instancefusion_tpu.models import segmentation as seg

INTR = Intrinsics(fx=129.3, fy=129.1, cx=79.5, cy=59.5, width=160, height=120)
NUM_CLASSES = 5  # bg + sphere/box/cylinder (+1 spare)
WIDTH = 16
STEPS = int(os.environ.get("STEPS", "400"))
OUT = os.path.join(
    os.path.dirname(__file__),
    "instancefusion_tpu", "models", "weights", "seghead_synthetic_w16.npz",
)


def make_frames(n=24):
    poses = np.concatenate([
        np.asarray(synthetic.orbit_trajectory(n // 2, sweep=1.6)),
        np.asarray(synthetic.handheld_trajectory(n - n // 2, sweep=1.8)),
    ])
    return [synthetic.render_frame(jnp.asarray(p), INTR) for p in poses]


def targets(frame):
    # Walls (instance id 0) are stuff/background; objects 1..3 are things.
    inst = jnp.where(frame.instance == 0, -1, frame.instance)
    class_of = jnp.arange(NUM_CLASSES, dtype=jnp.int32)  # id i -> class i
    return seg.targets_from_instances(inst, class_of)


def main():
    frames = make_frames()
    tgts = [targets(f) for f in frames]
    params = seg.init_params(
        jax.random.PRNGKey(0), INTR.height, INTR.width, NUM_CLASSES, WIDTH
    )
    tx = optax.adam(
        optax.cosine_decay_schedule(1e-3, STEPS, alpha=0.05)
    )
    opt_state = tx.init(params)

    step = jax.jit(
        lambda p, o, rgb, t: seg.train_step(
            p, o, rgb, t, tx, NUM_CLASSES, WIDTH
        )
    )
    rng = np.random.default_rng(0)
    for it in range(STEPS):
        i = int(rng.integers(len(frames)))
        params, opt_state, loss, aux = step(
            params, opt_state, frames[i].color, tgts[i]
        )
        if it % 50 == 0 or it == STEPS - 1:
            print(f"step {it}: loss {float(loss):.4f} "
                  f"ce {float(aux['ce']):.4f} center {float(aux['center']):.5f} "
                  f"offset {float(aux['offset']):.3f}", flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    seg.save_pretrained(OUT, params)
    print("saved", OUT, f"{os.path.getsize(OUT)/1e6:.2f} MB")

    # Quick self-check: pixel accuracy of the grouped masks on a frame.
    s = seg.segment(params, frames[0].color, NUM_CLASSES, 8, WIDTH)
    gt = np.asarray(jnp.where(frames[0].instance == 0, -1, frames[0].instance))
    pred = np.asarray(s.mask_id)
    cls = np.asarray(s.classes)
    pred_cls = np.where(pred >= 0, cls[np.maximum(pred, 0)], 0)
    acc = (pred_cls == np.where(gt > 0, gt, 0)).mean()
    print(f"pixel class accuracy on frame 0: {acc:.3f}")


if __name__ == "__main__":
    main()
