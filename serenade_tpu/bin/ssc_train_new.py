"""serenade-train-modded: training CLI for the SerenadeNew variant
(reference bin/ssc_train_new.py — identical flow with FeatsDatasetNew)."""

from serenade_tpu.bin.ssc_train import main as _main


def main():
    _main(dataset_name="FeatsDatasetNew")


if __name__ == "__main__":
    main()
