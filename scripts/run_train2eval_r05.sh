#!/bin/bash
# Round-5 quality loop (VERDICT r04 item 5): train the full stack on the
# local synthetic corpus, then run the COMPLETE eval protocol on its
# generations. Stages (all on the one TPU chip, sequential):
#   A  train the 1-D mel VAE (recon+KL; disc off) on corpus mels
#   B  train the M-config DiT via the real trainer (frozen trained VAE,
#      hash-tokenizer text encoders training jointly, CFG dropout 0.2)
#   B0 1-step control checkpoint (random-init DiT, same VAE/scale recipe)
#   C  train the melception eval classifier (+ train-stats z-norm cache)
#   D  generate train-manifest prompts (288: FD needs sample count) from trained + control checkpoints
#   E  cal_fd_score (melception FD/KL), predict_melclf accuracy,
#      cal_clap_score (random CLAP towers: pipeline exercise; relative only)
# Results land in /tmp/t2e_*.log; summarized into TRAIN2EVAL_r05.json by
# scripts/summarize_train2eval_r05.py.
#
# Detached: nohup bash scripts/run_train2eval_r05.sh > /tmp/t2e_main.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export HF_HUB_OFFLINE=1
TSV=data/synth/manifest_mel.tsv
VTSV=data/synth/manifest_val_mel.tsv

echo "=== stage A: VAE ($(date +%T)) ==="
python scripts/train_vae.py --tsv $TSV --steps 1500 --batch_size 8 \
    --lr 1e-5 --lr_multiplier 16 --kl_weight 1e-6 --disc_start 999999 \
    --ckpt_dir logs/vae_synth --ckpt_every 0 2>&1 | tail -40

VAE_CKPT=$(ls -d logs/vae_synth/step_* | tail -1)
echo "VAE ckpt: $VAE_CKPT"

echo "=== stage B: DiT M ($(date +%T)) ==="
python scripts/train.py -t -b configs/txt2audio-cfm-cfg.yaml \
    --vae_ckpt "$VAE_CKPT" --max_steps 6000 --batch_size 16 \
    --ckpt_dir logs/m_synth \
    model.params.cond_stage_trainable=false \
    data.params.train.params.dataset_cfg.dataset_name=$TSV \
    data.params.validation.params.dataset_cfg.dataset_name=$VTSV \
    > /tmp/t2e_dit.log 2>&1
tail -5 /tmp/t2e_dit.log

echo "=== stage B0: control ckpt ($(date +%T)) ==="
python scripts/train.py -t -b configs/txt2audio-cfm-cfg.yaml \
    --vae_ckpt "$VAE_CKPT" --max_steps 1 --batch_size 16 \
    --ckpt_dir logs/m_synth_ctrl \
    model.params.cond_stage_trainable=false \
    data.params.train.params.dataset_cfg.dataset_name=$TSV \
    > /tmp/t2e_ctrl.log 2>&1
tail -3 /tmp/t2e_ctrl.log

echo "=== stage C: melception classifier ($(date +%T)) ==="
python scripts/train_melclf.py --tsv $TSV --backbone melception \
    --steps 1200 --batch_size 16 --norm --norm_cache data/synth/ \
    --val_tsv $VTSV --val_every 400 --ckpt_dir logs/melclf_synth \
    2>&1 | tail -25

echo "=== stage D: generation ($(date +%T)) ==="
for who in trained ctrl; do
  CKPT=logs/m_synth/last; [ $who = ctrl ] && CKPT=logs/m_synth_ctrl/last
  python scripts/txt2audio.py -r $CKPT --test-dataset $TSV \
      --outdir outputs/t2e_$who --save_mel --batch_size 8 --n_samples 1 \
      --steps 25 -H 20 -W 312 > /tmp/t2e_gen_$who.log 2>&1
  tail -2 /tmp/t2e_gen_$who.log
done

echo "=== stage E: eval ($(date +%T)) ==="
STATS=$(ls data/synth/*means_stds* 2>/dev/null | head -1)
CLF=logs/melclf_synth/final
for who in trained ctrl; do
  python scripts/cal_fd_score.py --gen_dir outputs/t2e_$who \
      --ref_dir data/synth/mels --clf_ckpt "$CLF" --backbone melception \
      --num_classes 8 --norm_stats "$STATS" \
      > /tmp/t2e_fd_$who.log 2>&1 || true
  tail -3 /tmp/t2e_fd_$who.log
  python scripts/cal_clap_score.py --wav_dir outputs/t2e_$who --tsv $TSV \
      > /tmp/t2e_clap_$who.log 2>&1 || true
  tail -2 /tmp/t2e_clap_$who.log
done
echo "=== done ($(date +%T)) ==="
