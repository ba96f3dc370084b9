#!/usr/bin/env bash
# Full experiment matrix: {6 model families} x {5 targets} x {modality
# combos} — train, eval, explain, clinical baselines.
#
# Orchestration equivalent of the reference's runner.sh protocol
# (reference runner.sh:82-784), driving the TPU-native CLI apps. Each block
# can be run independently; all state lands under ${PROJ}/results.
#
# Required env:
#   PROJ  — project root (results live in ${PROJ}/results)
#   DATA  — prepared-data root (OAI_*_prep dirs)
set -euo pipefail

PROJ="${PROJ:?set PROJ=<project root>}"
DATA="${DATA:?set DATA=<prepared data root>}"
PY="python -m"

L_TARGETS=(prog_kl_12 prog_kl_24 prog_kl_36 prog_kl_48 tiulpin2019_prog_bin)

COMMON=(path_project_root="${PROJ}" path_data_root="${DATA}"
        training.epochs.num=60)

# ---------------------------------------------------------------------------
# 0. Data preparation (run once)
# ---------------------------------------------------------------------------
prepare_data() {
  ${PY} oaprogressionmmf_tpu.run.prepare_data_xr_oulu \
    dir_root_mipt_xr="${DATA}/XR_Oulu_raw" \
    dir_root_output="${DATA}/OAI_XR_PA_prep" num_threads=12
  ${PY} oaprogressionmmf_tpu.run.prepare_data_mri_oai \
    dir_root_oai_mri="${DATA}/OAI_MRI_raw" \
    path_csv_extract="${DATA}/OAI_Clin_prep/meta_extract__sag_3d_dess.csv" \
    dir_root_output="${DATA}/OAI_SAG_3D_DESS_prep" num_threads=12
  ${PY} oaprogressionmmf_tpu.run.prepare_data_mri_oai \
    dir_root_oai_mri="${DATA}/OAI_MRI_raw" \
    path_csv_extract="${DATA}/OAI_Clin_prep/meta_extract__cor_iw_tse.csv" \
    dir_root_output="${DATA}/OAI_COR_IW_TSE_prep" num_threads=12
  ${PY} oaprogressionmmf_tpu.run.prepare_data_mri_oai \
    dir_root_oai_mri="${DATA}/OAI_MRI_raw" \
    path_csv_extract="${DATA}/OAI_Clin_prep/meta_extract__sag_t2_map.csv" \
    dir_root_output="${DATA}/OAI_SAG_T2_MAP_prep" num_threads=12
}

# ---------------------------------------------------------------------------
# 1. XR-only CNN  (batch 64, lr 1e-3, warmup-multistep)
# ---------------------------------------------------------------------------
train_xr1_cnn() {
  for TGT in "${L_TARGETS[@]}"; do
    ${PY} oaprogressionmmf_tpu.run.train_prog_fus model=xr1_cnn \
      "${COMMON[@]}" experiment_id="xr1_cnn__${TGT}" \
      data.target="${TGT}" 'data.sets.n0.modals=[xr_pa]' \
      'model.input_size=[[700,700]]' 'model.downscale=[[0.5,0.5]]' \
      model.fe.arch=resnext50_32x4d \
      training.batch_size=64 training.optim.lr_init=1e-3 \
      training.sched.name=CustomWarmupMultiStepLR \
      'training.sched.params={epochs_warmup: 5, mstep_milestones: [20, 40]}'
  done
}

# ---------------------------------------------------------------------------
# 2. Single-MRI CNN+FeaT  (batch 32)
# ---------------------------------------------------------------------------
train_mr1_cnn_trf() {
  declare -A SIZES=([sag_3d_dess]="[[320,320,128]]"
                    [cor_iw_tse]="[[320,320,32]]"
                    [sag_t2_map]="[[320,320,25]]")
  declare -A DS=([sag_3d_dess]="[[0.5,0.5,0.5]]"
                 [cor_iw_tse]="[[0.5,0.5,1.0]]"
                 [sag_t2_map]="[[0.5,0.5,1.0]]")
  declare -A NSL=([sag_3d_dess]=64 [cor_iw_tse]=32 [sag_t2_map]=25)
  for TGT in "${L_TARGETS[@]}"; do
    for MOD in sag_3d_dess cor_iw_tse sag_t2_map; do
      ${PY} oaprogressionmmf_tpu.run.train_prog_fus model=mr1_cnn_trf \
        "${COMMON[@]}" experiment_id="mr1_cnn_trf__${MOD}__${TGT}" \
        data.target="${TGT}" "data.sets.n0.modals=[${MOD}]" \
        "model.input_size=${SIZES[$MOD]}" "model.downscale=${DS[$MOD]}" \
        "model.agg.num_slices=${NSL[$MOD]}" training.batch_size=32
    done
  done
}

# ---------------------------------------------------------------------------
# 3. Two-MRI CNN+FeaT  (batch 16)
# ---------------------------------------------------------------------------
train_mr2_cnn_trf() {
  for TGT in "${L_TARGETS[@]}"; do
    ${PY} oaprogressionmmf_tpu.run.train_prog_fus model=mr2_cnn_trf \
      "${COMMON[@]}" experiment_id="mr2_cnn_trf__dess_tse__${TGT}" \
      data.target="${TGT}" 'data.sets.n0.modals=[sag_3d_dess, cor_iw_tse]' \
      'model.input_size=[[320,320,128],[320,320,32]]' \
      'model.downscale=[[0.5,0.5,0.5],[0.5,0.5,1.0]]' \
      'model.agg.num_slices=[64, 32]' training.batch_size=16
  done
}

# ---------------------------------------------------------------------------
# 4. XR + 1 MRI fusion  (batch 32)
# ---------------------------------------------------------------------------
train_xr1mr1_cnn_trf() {
  for TGT in "${L_TARGETS[@]}"; do
    ${PY} oaprogressionmmf_tpu.run.train_prog_fus model=xr1mr1_cnn_trf \
      "${COMMON[@]}" experiment_id="xr1mr1_cnn_trf__dess__${TGT}" \
      data.target="${TGT}" 'data.sets.n0.modals=[xr_pa, sag_3d_dess]' \
      'model.input_size=[[700,700],[320,320,128]]' \
      'model.downscale=[[0.5,0.5],[0.5,0.5,0.5]]' \
      'model.agg.num_slices=[1, 64]' training.batch_size=32
  done
}

# ---------------------------------------------------------------------------
# 5. XR + 2 MRI hierarchical fusion  (batch 16)
# ---------------------------------------------------------------------------
train_xr1mr2_cnn_trf() {
  for TGT in "${L_TARGETS[@]}"; do
    ${PY} oaprogressionmmf_tpu.run.train_prog_fus model=xr1mr2_cnn_trf \
      "${COMMON[@]}" experiment_id="xr1mr2_cnn_trf__${TGT}" \
      data.target="${TGT}" \
      'data.sets.n0.modals=[xr_pa, sag_3d_dess, cor_iw_tse]' \
      training.batch_size=16
  done
}

# ---------------------------------------------------------------------------
# 6. Flagship 4-modality fusion  (batch 16)
# ---------------------------------------------------------------------------
train_xr1mr2c1_cnn_trf() {
  for TGT in "${L_TARGETS[@]}"; do
    ${PY} oaprogressionmmf_tpu.run.train_prog_fus model=xr1mr2c1_cnn_trf \
      "${COMMON[@]}" experiment_id="xr1mr2c1_cnn_trf__${TGT}" \
      data.target="${TGT}" \
      'data.sets.n0.modals=[xr_pa, sag_3d_dess, sag_t2_map, clin]' \
      training.batch_size=16
  done
}

# ---------------------------------------------------------------------------
# Eval + explain every trained experiment
# ---------------------------------------------------------------------------
eval_all() {
  for EXP_DIR in "${PROJ}"/results/*/; do
    EXP="$(basename "${EXP_DIR}")"
    [ -d "${EXP_DIR}/weights" ] || continue
    MODEL="${EXP%%__*}"
    TGT="${EXP##*__}"
    ${PY} oaprogressionmmf_tpu.run.eval_prog_fus "model=${MODEL}" \
      path_project_root="${PROJ}" path_data_root="${DATA}" \
      experiment_id="${EXP}" data.target="${TGT}" testing.regime=eval
    ${PY} oaprogressionmmf_tpu.run.eval_prog_fus "model=${MODEL}" \
      path_project_root="${PROJ}" path_data_root="${DATA}" \
      experiment_id="${EXP}" data.target="${TGT}" testing.regime=explain \
      testing.explain_fn=modal_abl
  done
}

# ---------------------------------------------------------------------------
# Clinical baselines (LR + DT over clinical variable subsets)
# ---------------------------------------------------------------------------
train_clin_baselines() {
  for TGT in "${L_TARGETS[@]}"; do
    for VARS in "[age, sex, bmi]" "[age, sex, bmi, kl]" \
                "[age, sex, bmi, surg, inj, womac]" \
                "[age, sex, bmi, kl, surg, inj, womac]"; do
      ${PY} oaprogressionmmf_tpu.run.train_prog_clin \
        path_project_root="${PROJ}" path_data_root="${DATA}" \
        experiment_id="clin__${TGT}__$(echo "${VARS}" | tr -d '[] ,')" \
        data.target="${TGT}" "model.vars=${VARS}" \
        model.params_init=grid_search
    done
  done
}

case "${1:-all}" in
  prepare) prepare_data ;;
  xr1) train_xr1_cnn ;;
  mr1) train_mr1_cnn_trf ;;
  mr2) train_mr2_cnn_trf ;;
  xr1mr1) train_xr1mr1_cnn_trf ;;
  xr1mr2) train_xr1mr2_cnn_trf ;;
  xr1mr2c1) train_xr1mr2c1_cnn_trf ;;
  eval) eval_all ;;
  clin) train_clin_baselines ;;
  all)
    train_xr1_cnn; train_mr1_cnn_trf; train_mr2_cnn_trf
    train_xr1mr1_cnn_trf; train_xr1mr2_cnn_trf; train_xr1mr2c1_cnn_trf
    eval_all; train_clin_baselines ;;
  *) echo "usage: runner.sh {prepare|xr1|mr1|mr2|xr1mr1|xr1mr2|xr1mr2c1|eval|clin|all}"; exit 1 ;;
esac
