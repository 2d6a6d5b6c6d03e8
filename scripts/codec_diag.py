"""Audit the entropy coder: actual bytes vs model estimate, per stream.

Loads a trained checkpoint, runs encode_scene with stream_stats, and prints
the bit-cost decomposition per stream (VERDICT r4 weak #3):

  ideal    — gaussian cross-entropy of the ACTUAL coded symbols under the
             coder's own (mu, sigma, Q): the best any coder could do given
             this entropy model (matches the training-time size estimate up
             to round-vs-noise quantization differences)
  window   — cost under the float windowed CDF (adds window-edge/escape
             probability reshaping)
  qcdf     — cost under the uint16-quantized CDF (adds the >=1-bin floor:
             the mass stolen from real bins scales with the window width)
  payload  — bytes the range coder actually wrote (adds coder slack, ~0)
  escape   — raw side-stream bytes for out-of-window residuals

Usage: python scripts/codec_diag.py -m /root/r4_bench/l0.004 [--force_cpu]
"""

import argparse
import glob
import json
import os
import pickle
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model_path", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--force_cpu", action="store_true")
    p.add_argument("--out", default=None,
                   help="also dump the decomposition as JSON here")
    args = p.parse_args()

    if args.force_cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    from contextgs_tpu.config import TrainConfig
    from contextgs_tpu.models import state as st
    from contextgs_tpu.train.optim import init_adam
    from contextgs_tpu.utils.checkpoint import load_pytree
    from contextgs_tpu.compression.codec import encode_scene

    with open(os.path.join(args.model_path, "cfg_args")) as f:
        cfg = TrainConfig.from_json(f.read())
    ckpt_path = args.checkpoint or sorted(
        (q for q in glob.glob(os.path.join(args.model_path, "chkpnt*.pkl"))
         if not q.endswith(".meta.pkl")),
        key=lambda q: int("".join(filter(str.isdigit, os.path.basename(q)))))[-1]
    with open(ckpt_path, "rb") as f:
        raw = pickle.load(f)
    import numpy as np
    model0, _ = st.init_scene_model(
        jax.random.PRNGKey(0), np.zeros((10, 3), np.float32), cfg.model,
        capacity=raw["leaves"][0].shape[0])
    ckpt = load_pytree(ckpt_path, dict(params=model0.params,
                                       buffers=model0.buffers,
                                       adam=init_adam(model0.params)))
    with open(ckpt_path.replace(".pkl", ".meta.pkl"), "rb") as f:
        meta = pickle.load(f)

    stats: dict = {}
    with tempfile.TemporaryDirectory() as td:
        bits = encode_scene(ckpt["params"], ckpt["buffers"], cfg.model,
                            meta["level_scales"], meta["voxel_size"], td,
                            disable_hyper=cfg.opt.disable_hyper,
                            stream_stats=stats)

    mb = 8 * 1024 * 1024
    print(f"{'stream':>8} {'n_sym':>9} {'ideal':>8} {'window':>8} "
          f"{'qcdf':>8} {'payload':>8} {'escape':>8} {'act/ideal':>9} "
          f"{'esc%':>6} windows")
    report = {}
    for name, s in stats.items():
        if not s:
            continue
        act = s["payload_bits"] + s["escape_bits"]
        wins = sorted(set(s.get("windows", [])))
        print(f"{name:>8} {s['n_sym']:>9} {s['ideal_bits']/mb:>8.4f} "
              f"{s['win_bits']/mb:>8.4f} {s['qcdf_bits']/mb:>8.4f} "
              f"{s['payload_bits']/mb:>8.4f} {s['escape_bits']/mb:>8.4f} "
              f"{act/max(s['ideal_bits'],1e-9):>9.3f} "
              f"{100*s['n_escape']/max(s['n_sym'],1):>6.2f} {wins}")
        report[name] = {k: (v if not isinstance(v, float) else round(v, 1))
                        for k, v in s.items()}
    print("encode totals (MB):",
          {k: round(v / mb, 4) for k, v in bits.items()
           if k not in ("time_s",)})
    if args.out:
        with open(args.out, "w") as f:
            json.dump(dict(streams=report,
                           totals={k: v for k, v in bits.items()}), f)


if __name__ == "__main__":
    main()
