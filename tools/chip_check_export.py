#!/usr/bin/env python
"""Verify an exported .irpx artifact executes on the REAL TPU backend.

The export tests prove the round trip on CPU; the headline claim —
"export on any host, serve on the chip" — additionally needs the
deserialized program to pass jax.export's call-time platform check and
run on this host's TPU, which is reached through the custom 'axon'
PJRT tunnel (export_predictor lowers for 'axon' by default for exactly
this).  This script exports a tiny predictor, reloads the artifact,
runs it on the real backend, and compares against the live predictor.

Prints ONE JSON line: {"ok": true, "platform": ..., "max_diff": ...}.
Run via tools/chip_session.sh (stage: export_chip).
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from irp_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def main():
    import jax
    import numpy as np

    from irp_tpu.config import ModelConfig
    from irp_tpu.export import export_predictor, load_exported_predictor
    from irp_tpu.infer import make_predictor
    from irp_tpu.models.classifier import init_classifier

    print(f"backend: {jax.default_backend()} "
          f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    cfg = ModelConfig(depth=18, num_classes=3, image_size=32,
                      hidden_dim=16, compute_dtype="float32")
    _, variables = init_classifier(cfg, jax.random.PRNGKey(0),
                                   image_size=32)
    live = make_predictor(variables, cfg=cfg, batch_size=4)
    rng = np.random.default_rng(7)
    images = rng.integers(0, 256, (5, 48, 48, 3), dtype=np.uint8)

    with tempfile.TemporaryDirectory() as td:
        path = export_predictor(live, os.path.join(td, "m.irpx"),
                                source_size=48)
        print("exported; loading + running on the chip ...",
              file=sys.stderr, flush=True)
        loaded = load_exported_predictor(path)
        got = loaded.predict_probs(images)     # executes the artifact
        want = live.predict_probs(images)      # live forward, same chip

        # the baked Grad-CAM program must execute on the chip too
        from irp_tpu.explain import GradCAM
        print("running the baked explain program ...",
              file=sys.stderr, flush=True)
        got_cam, _ = GradCAM(loaded).explain(images)
        want_cam, _ = GradCAM(live).explain(images)

    diff = float(np.abs(got - want).max())
    cam_diff = float(np.abs(got_cam - want_cam).max())
    ok = bool(diff <= 1e-5 and np.isfinite(got).all()
              and cam_diff <= 1e-5 and np.isfinite(got_cam).all())
    print(json.dumps({"ok": ok, "platform": jax.default_backend(),
                      "max_diff": diff, "cam_max_diff": cam_diff}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
