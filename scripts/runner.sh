#!/usr/bin/env bash
# Full experiment matrix: {6 model families} x {5 targets} x {modality
# combos} — prepare, train, eval, explain, clinical baselines.
#
# Orchestration equivalent of the reference's runner.sh protocol
# (reference runner.sh:46-784), driving the TPU-native CLI apps. The combo
# table below is block-for-block with the reference's train matrix:
#   xr1_cnn            1 combo   (runner.sh:86-104)
#   mr1_cnn_trf        3 combos  (runner.sh:108-156)
#   mr2_cnn_trf        3 pairs   (runner.sh:160-212)
#   xr1mr1_cnn_trf     3 combos  (runner.sh:216-269)
#   xr1mr2_cnn_trf     3 combos  (runner.sh:273-337)
#   xr1mr2c1_cnn_trf   1 combo   (runner.sh:340-363)
# and every trained combo is evaluated + explained (runner.sh:366-784).
#
# Required env:
#   PROJ  — project root (results live in ${PROJ}/results)
#   DATA  — prepared-data root (OAI_*_prep dirs)
# Optional:
#   EPOCHS (60), PROFILE (none|time|compute|trace)
set -euo pipefail

PROJ="${PROJ:?set PROJ=<project root>}"
DATA="${DATA:?set DATA=<prepared data root>}"
EPOCHS="${EPOCHS:-60}"
PROFILE="${PROFILE:-none}"
PY="python -m"

L_TARGETS=(prog_kl_12 prog_kl_24 prog_kl_36 prog_kl_48 tiulpin2019_prog_bin)

COMMON=(path_project_root="${PROJ}" path_data_root="${DATA}"
        "training.epochs.num=${EPOCHS}")

# Fusion-family FE selection (reference runner.sh:224-227 etc.)
FE_FUSION=(model.fe.xr.arch=resnext50_32x4d model.fe.xr.pretrained=true
           model.fe.mr.arch=resnet50 model.fe.mr.pretrained=true)

# ---------------------------------------------------------------------------
# Combo table: family → "combo-name : modals : input_size : downscale :
#                        num_slices : train-batch"
# Sizes/downscales/slice-counts are the reference's per-combo values.
# ---------------------------------------------------------------------------
COMBOS=(
  "xr1_cnn:xr:[xr_pa]:[[700,700]]:[[0.5,0.5]]:-:64"
  "mr1_cnn_trf:dess:[sag_3d_dess]:[[320,320,128]]:[[0.5,0.5,0.5]]:64:32"
  "mr1_cnn_trf:tse:[cor_iw_tse]:[[320,320,32]]:[[0.5,0.5,1.0]]:32:32"
  "mr1_cnn_trf:t2:[sag_t2_map]:[[320,320,25]]:[[0.5,0.5,1.0]]:25:32"
  "mr2_cnn_trf:dess_tse:[sag_3d_dess,cor_iw_tse]:[[320,320,128],[320,320,32]]:[[0.5,0.5,0.5],[0.5,0.5,1.0]]:[64,32]:16"
  "mr2_cnn_trf:dess_t2:[sag_3d_dess,sag_t2_map]:[[320,320,128],[320,320,25]]:[[0.5,0.5,0.5],[0.5,0.5,1.0]]:[64,25]:16"
  "mr2_cnn_trf:tse_t2:[cor_iw_tse,sag_t2_map]:[[320,320,32],[320,320,25]]:[[0.5,0.5,1.0],[0.5,0.5,1.0]]:[32,25]:16"
  "xr1mr1_cnn_trf:xr_dess:[xr_pa,sag_3d_dess]:[[700,700],[320,320,128]]:[[0.5,0.5],[0.5,0.5,0.5]]:[1,64]:32"
  "xr1mr1_cnn_trf:xr_tse:[xr_pa,cor_iw_tse]:[[700,700],[320,320,32]]:[[0.5,0.5],[0.5,0.5,1.0]]:[1,32]:32"
  "xr1mr1_cnn_trf:xr_t2:[xr_pa,sag_t2_map]:[[700,700],[320,320,25]]:[[0.5,0.5],[0.5,0.5,1.0]]:[1,25]:32"
  "xr1mr2_cnn_trf:xr_dess_tse:[xr_pa,sag_3d_dess,cor_iw_tse]:[[700,700],[320,320,128],[320,320,32]]:[[0.5,0.5],[0.5,0.5,0.5],[0.5,0.5,1.0]]:[1,64,32]:16"
  "xr1mr2_cnn_trf:xr_dess_t2:[xr_pa,sag_3d_dess,sag_t2_map]:[[700,700],[320,320,128],[320,320,25]]:[[0.5,0.5],[0.5,0.5,0.5],[0.5,0.5,1.0]]:[1,64,25]:16"
  "xr1mr2_cnn_trf:xr_tse_t2:[xr_pa,cor_iw_tse,sag_t2_map]:[[700,700],[320,320,32],[320,320,25]]:[[0.5,0.5],[0.5,0.5,1.0],[0.5,0.5,1.0]]:[1,32,25]:16"
  "xr1mr2c1_cnn_trf:xr_dess_t2_clin:[xr_pa,sag_3d_dess,sag_t2_map,clin]:[[700,700],[320,320,128],[320,320,25],[16]]:[[0.5,0.5],[0.5,0.5,0.5],[0.5,0.5,1.0],[1.0]]:[1,64,25,1]:16"
)

_family_args() {
  # per-family FE/optim args beyond the combo table
  local model="$1"
  case "${model}" in
    xr1_cnn)
      echo "model.fe.arch=resnext50_32x4d model.fe.pretrained=true" \
           "training.optim.lr_init=1e-3" \
           "training.sched.name=CustomWarmupMultiStepLR" \
           "training.sched.params={epochs_warmup:+5,+mstep_milestones:+[20,+40]}" ;;
    mr1_cnn_trf|mr2_cnn_trf)
      echo "model.fe.pretrained=true" ;;
    xr1mr2c1_cnn_trf)
      echo "${FE_FUSION[*]}" \
           "model.fe.xr.dropout=0.1 model.fe.mr.dropout=0.1" \
           "model.fe.clin.dropout=0.1" \
           "model.fe.clin.dim_in=9 model.fe.clin.dim_out=2048" ;;
    *)  # xr1mr1 / xr1mr2
      echo "${FE_FUSION[*]}" ;;
  esac
}

_run_combo() {
  # $1 = combo row, $2 = target, $3 = regime (train|eval|explain)
  local row="$1" TGT="$2" regime="$3"
  local model combo modals sizes ds nsl batch
  IFS=':' read -r model combo modals sizes ds nsl batch <<< "${row}"
  local exp="${model}__${combo}__${TGT}"
  local args=(model="${model}" "${COMMON[@]}" experiment_id="${exp}"
              data.target="${TGT}" "data.sets.n0.modals=${modals}"
              "model.input_size=${sizes}" "model.downscale=${ds}")
  [ "${nsl}" != "-" ] && args+=("model.agg.num_slices=${nsl}")
  # shellcheck disable=SC2207
  local fam=($(_family_args "${model}"))
  # the sched params contain '+'-encoded spaces (yaml flow needs them)
  local fam_decoded=()
  for a in "${fam[@]}"; do fam_decoded+=("${a//+/ }"); done

  case "${regime}" in
    train)
      ${PY} oaprogressionmmf_tpu.run.train_prog_fus "${args[@]}" \
        "${fam_decoded[@]}" \
        "training.batch_size=${batch}" "validation.batch_size=${batch}" ;;
    eval)
      ${PY} oaprogressionmmf_tpu.run.eval_prog_fus "${args[@]}" \
        "${fam_decoded[@]}" model.restore_weights=true \
        "testing.batch_size=${batch}" "testing.profile=${PROFILE}" \
        data.ignore_cache=true testing.regime=eval ;;
    explain)
      # modal-ablation regime (reference runner.sh:372-379)
      ${PY} oaprogressionmmf_tpu.run.eval_prog_fus "${args[@]}" \
        "${fam_decoded[@]}" model.restore_weights=true \
        model.output_type=main "testing.batch_size=${batch}" \
        data.ignore_cache=true testing.regime=explain \
        testing.explain_fn=modal_abl testing.use_cached=true ;;
  esac
}

_matrix() {
  # $1 = regime, $2 = optional family filter
  local regime="$1" family="${2:-}"
  for row in "${COMBOS[@]}"; do
    [ -n "${family}" ] && [[ "${row}" != "${family}:"* ]] && continue
    for TGT in "${L_TARGETS[@]}"; do
      echo ">>> ${regime}: ${row%%:*} / ${TGT}"
      _run_combo "${row}" "${TGT}" "${regime}"
    done
  done
}

# ---------------------------------------------------------------------------
# 0. Data preparation (run once; reference runner.sh:46-78 + targets nb)
# ---------------------------------------------------------------------------
prepare_data() {
  # targets (Targets_meta_and_scans_from_OAI.ipynb label-derivation cells)
  ${PY} oaprogressionmmf_tpu.run.prepare_targets_oai \
    path_kl_long="${DATA}/OAI_Clin_raw/kl_long.csv" \
    path_clin_base="${DATA}/OAI_Clin_raw/clin_base.csv" \
    path_tiulpin="${DATA}/OAI_Clin_raw/tiulpin2019.csv" \
    dir_root_output="${DATA}/OAI_Clin_prep"
  # per-sequence DICOM copy out of the OAI release (notebook scan-copy
  # cells), then conversion to the prepared NIfTI trees
  for SEQ in SAG_3D_DESS COR_IW_TSE SAG_T2_MAP; do
    seq_lower="$(echo "${SEQ}" | tr '[:upper:]' '[:lower:]')"
    ${PY} oaprogressionmmf_tpu.run.prepare_targets_oai \
      dir_scan_source="${DATA}/OAIBaselineImages" \
      dir_scan_target="${DATA}/OAI_${SEQ}_raw" \
      path_csv_extract="${DATA}/meta_extract__${seq_lower}.csv" \
      num_threads=12
    ${PY} oaprogressionmmf_tpu.run.prepare_data_mri_oai \
      dir_root_oai_mri="${DATA}/OAI_${SEQ}_raw" \
      path_csv_extract="${DATA}/meta_extract__${seq_lower}.csv" \
      dir_root_output="${DATA}/OAI_${SEQ}_prep" num_threads=12
  done
  ${PY} oaprogressionmmf_tpu.run.prepare_data_xr_oulu \
    dir_root_mipt_xr="${DATA}/OAI_XR_ROIs" \
    dir_root_output="${DATA}/OAI_XR_PA_prep" num_threads=12
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

# ---------------------------------------------------------------------------
# Results analysis (Analysis_Visualization.ipynb equivalent)
# ---------------------------------------------------------------------------
analyze() {
  ${PY} oaprogressionmmf_tpu.run.analyze_results \
    path_project_root="${PROJ}" path_data_root="${DATA}"
}

case "${1:-all}" in
  prepare)   prepare_data ;;
  xr1)       _matrix train xr1_cnn ;;
  mr1)       _matrix train mr1_cnn_trf ;;
  mr2)       _matrix train mr2_cnn_trf ;;
  xr1mr1)    _matrix train xr1mr1_cnn_trf ;;
  xr1mr2)    _matrix train xr1mr2_cnn_trf ;;
  xr1mr2c1)  _matrix train xr1mr2c1_cnn_trf ;;
  train)     _matrix train ;;
  eval)      _matrix eval "${2:-}" ;;
  explain)   _matrix explain "${2:-}" ;;
  clin)      train_clin_baselines ;;
  analyze)   analyze ;;
  all)
    _matrix train; _matrix eval; _matrix explain
    train_clin_baselines; analyze ;;
  *) echo "usage: runner.sh {prepare|xr1|mr1|mr2|xr1mr1|xr1mr2|xr1mr2c1|train|eval [family]|explain [family]|clin|analyze|all}"
     exit 1 ;;
esac
