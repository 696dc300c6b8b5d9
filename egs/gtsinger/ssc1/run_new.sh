#!/usr/bin/env bash
# SerenadeNew (F0-fluctuation) variant of the recipe: same stage graph with
# the -modded CLIs and _new configs (reference run_new.sh), including its
# fix of the cyclic dev-dump path.
set -euo pipefail
exec bash run.sh \
    --variant new \
    --conf conf/serenade_new.yaml \
    --cyclic_conf conf/serenade_cyclic_new.yaml \
    --expdir exp/serenade_new \
    "$@"
