"""serenade-preprocess-modded: preprocessing with the F0-fluctuation stream
(reference bin/preprocess_new.py — identical to preprocess plus the
spline-residual ``f0_fluc`` h5 key, preprocess_new.py:538-550,619-623)."""

from serenade_tpu.bin.preprocess import build_argparser, run


def main():
    run(build_argparser().parse_args(), with_f0_fluc=True)


if __name__ == "__main__":
    main()
