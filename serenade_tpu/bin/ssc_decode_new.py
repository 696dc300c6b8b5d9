"""serenade-decode-modded: decoding CLI for the SerenadeNew variant
(reference bin/ssc_decode_new.py — adds f0_fluc / ref_f0_fluc feeds)."""

from serenade_tpu.bin.ssc_decode import run


def main():
    run(variant_new=True)


if __name__ == "__main__":
    main()
