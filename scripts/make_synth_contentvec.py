#!/usr/bin/env python3
"""Build a synthetic ContentVec torch checkpoint (HF HubertModel layout,
seeded random weights).

The released ``lengyue233/content-vec-best`` weights cannot be fetched
on a zero-egress machine, but validating the framework's L1 front-end
under training load (VERDICT r4 item 3) needs the REAL extraction path
— the full conv stack + 12-layer transformer running on the TPU during
preprocessing — not the random-projection pseudo-content stand-in.
Random-init HuBERT features are a deterministic, content-dependent
conditioning signal (the conv stack is a bank of random filters; frames
with the same audio content map to the same feature), so training on
them exercises every part of the pipeline the released weights would.
Converter numerics vs torch are tested separately
(tests/test_contentvec.py, parity vs a transformers twin).

Reference analogue: /root/reference/serenade/bin/preprocess.py:361-368
loads the HF checkpoint and applies the stride-1 hack; this synthetic
checkpoint feeds the same loading path (bin/preprocess.py
make_content_fn -> convert_hf_hubert).
"""

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="pt_models/contentvec.pt")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import torch
    import transformers

    config = transformers.HubertConfig(
        hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
        intermediate_size=3072, classifier_proj_size=256,
        apply_spec_augment=False,
    )

    class HubertModelWithFinalProj(transformers.HubertModel):
        def __init__(self, config):
            super().__init__(config)
            self.final_proj = torch.nn.Linear(
                config.hidden_size, config.classifier_proj_size
            )

    torch.manual_seed(args.seed)
    model = HubertModelWithFinalProj(config).eval()
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    torch.save(model.state_dict(), args.out)
    n = sum(v.numel() for v in model.state_dict().values())
    print(f"wrote {args.out}: {n / 1e6:.1f} M params (seed {args.seed})")


if __name__ == "__main__":
    main()
