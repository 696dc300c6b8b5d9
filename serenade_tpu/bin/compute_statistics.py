"""serenade-compute_stats: fit feature scalers over the train dump.

Counterpart of reference bin/compute_statistics.py:25-149: StandardScaler
for `hubert`/`logmel`, MinMaxScaler for `score`/`loud`, dumped as
`stats.joblib` — the normalization contract consumed by train/decode/
vocoder-denorm.
"""

from __future__ import annotations

import argparse
import logging
import os

import joblib

from serenade_tpu.config import load_config
from serenade_tpu.utils.scalers import MinMaxScaler, StandardScaler


def main():
    p = argparse.ArgumentParser(description="fit feature scalers")
    p.add_argument("--rootdir", required=True, help="train dump directory")
    p.add_argument("--dumpdir", required=True, help="where to put stats.joblib")
    p.add_argument("--config", required=True)
    p.add_argument("--verbose", type=int, default=1)
    args = p.parse_args()

    logging.basicConfig(
        level=logging.INFO if args.verbose > 0 else logging.WARN,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )
    config = load_config(args.config)

    from serenade_tpu.utils.h5 import find_files

    files = sorted(find_files(args.rootdir, "*.h5"))
    if not files:
        raise SystemExit(f"no h5 dumps under {args.rootdir}")
    score_type = config.get("score_type", "est_lf0_score")

    scaler = {
        "hubert": StandardScaler(),
        "logmel": StandardScaler(),
        "score": MinMaxScaler(),
        "loud": MinMaxScaler(),
    }
    key_map = {"hubert": "hubert", "logmel": "logmel", "score": score_type,
               "loud": "loud"}
    seen = {k: 0 for k in scaler}
    import h5py

    for path in files:
        with h5py.File(path, "r") as f:
            for name, h5key in key_map.items():
                if h5key not in f:
                    continue  # e.g. dumps without content features
                scaler[name].partial_fit(f[h5key][()])
                seen[name] += 1
    for name, count in seen.items():
        if count == 0:
            logging.warning("no %r found in any dump; scaler left unfitted",
                            name)
        else:
            logging.info("fitted %s over %d utterances", name, count)

    os.makedirs(args.dumpdir, exist_ok=True)
    out = os.path.join(args.dumpdir, "stats.joblib")
    joblib.dump(scaler, out)
    logging.info("saved scaler statistics to %s", out)


if __name__ == "__main__":
    main()
