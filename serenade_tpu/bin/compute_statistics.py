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
from serenade_tpu.datasets.feats_dataset import FeatsDataset
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

    dataset = FeatsDataset(
        args.rootdir,
        scaler=None,
        score_type=config.get("score_type", "est_lf0_score"),
        logmel_type="logmel",
    )

    scaler = {
        "hubert": StandardScaler(),
        "logmel": StandardScaler(),
        "score": MinMaxScaler(),
        "loud": MinMaxScaler(),
    }
    for i in range(len(dataset)):
        item = dataset[i]
        scaler["hubert"].partial_fit(item["hubert"])
        scaler["logmel"].partial_fit(item["logmel"])
        scaler["score"].partial_fit(item["score"])
        scaler["loud"].partial_fit(item["loud"])

    os.makedirs(args.dumpdir, exist_ok=True)
    out = os.path.join(args.dumpdir, "stats.joblib")
    joblib.dump(scaler, out)
    logging.info("saved scaler statistics to %s", out)


if __name__ == "__main__":
    main()
