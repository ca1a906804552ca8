#!/usr/bin/env bash
# Full CVO-6 evaluation grid (reference test_cvo.sh): {clean,final} x
# {raft,gma} x {direct,acc} x {things,cvo checkpoints} = 16 runs.
set -e
CKPT=${CKPT_DIR:-checkpoints}
DATA=${DATA_ROOT:-data/cvor}

for split in clean final; do
  for ofe in raft gma; do
    python -m accflow_tpu.cli.test_cvo -d $split -acc direct -ofe $ofe \
        --ofe_ckpt $CKPT/$ofe-things.pth --dataset-root $DATA
    python -m accflow_tpu.cli.test_cvo -d $split -acc direct -ofe $ofe \
        --ofe_ckpt $CKPT/$ofe-cvo.pth --dataset-root $DATA
    python -m accflow_tpu.cli.test_cvo -d $split -acc acc -ofe $ofe \
        --acc_ckpt $CKPT/acc+$ofe-things.pth --dataset-root $DATA
    python -m accflow_tpu.cli.test_cvo -d $split -acc acc -ofe $ofe \
        --acc_ckpt $CKPT/acc+$ofe-cvo.pth --dataset-root $DATA
  done
done
