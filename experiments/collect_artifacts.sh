#!/bin/bash
# Copy the round's proof artifacts out of the gitignored output/ tree
# into docs/artifacts/<round>/ for commit (VERDICT r1 asked for the
# demo run, the finished training curve and the per-round TPU kernel
# validation to exist as committed evidence, not just local files).
set -u
ROUND=${1:-r2}
DST=docs/artifacts/$ROUND
mkdir -p "$DST"

# training curve (metrics.jsonl is ~1 line / 20 iters; keep it whole)
for d in output/lov_syn_*/; do
  name=$(basename "$d")
  [ -f "$d/metrics.jsonl" ] && cp "$d/metrics.jsonl" "$DST/${name}_metrics.jsonl"
done

# held-out synthetic eval results per snapshot (r2 and r3 naming)
for d in output/eval_syn_*/ output/r3_eval_syn_*/ output/linemod_*_eval/ output/r3_early_eval_*/; do
  name=$(basename "$d")
  for f in "$d"/*.json; do
    [ -f "$f" ] && cp "$f" "$DST/${name}_$(basename "$f")"
  done
done

# real-frame demo: detections + overlays + labels
for DEMO in output/demo output/r3_demo; do
  if [ -d "$DEMO" ]; then
    mkdir -p "$DST/$(basename "$DEMO")"
    cp "$DEMO"/detections.json "$DST/$(basename "$DEMO")/" 2>/dev/null
    cp "$DEMO"/*-overlay.png "$DST/$(basename "$DEMO")/" 2>/dev/null
  fi
done

# per-round TPU kernel validation + profiles
[ -f output/validate_tpu.json ] && cp output/validate_tpu.json "$DST/"
[ -f output/train_profile.json ] && cp output/train_profile.json "$DST/"

# training log tail (compile + first/last iters)
for f in experiments/logs/lov_syn_${ROUND}.log experiments/logs/train_chunked_${ROUND}.log; do
  [ -f "$f" ] && { head -5 "$f"; echo ...; tail -40 "$f"; } > "$DST/$(basename "$f" .log)_tail.log"
done

# learning-curve summary table (train loss probes + snapshot evals)
python experiments/summarize_run.py output/lov_syn_${ROUND} \
  > "$DST/run_summary.md" 2>/dev/null || true

echo "collected into $DST:"
find "$DST" -type f | sort

# round-3 rotation-diagnosis artifacts (oracle eval, head-only probe,
# jit-grad miscompile repro logs, fix proof)
for f in output/r3_rot_oracle_*.json output/r3_head_probe*.json; do
  [ -f "$f" ] && cp "$f" "$DST/"
done
for f in experiments/logs/r3_repro_jitgrad.log experiments/logs/r3_repro2.log \
         experiments/logs/r3_repro3.log experiments/logs/r3_repro4.log \
         experiments/logs/r3_fix_proof.log experiments/logs/r3_precision_ab.log \
         experiments/logs/r3_serve_bench.log experiments/logs/r3_btc.log \
         experiments/logs/r3_validate_tpu_fixed.log experiments/logs/r3_head_probe.log \
         experiments/logs/r3_head_probe_fixed.log; do
  [ -f "$f" ] && cp "$f" "$DST/$(basename "$f")"
done

# --- r6 additions ---
if [ "$ROUND" = "r6" ]; then
  # oracle convergence curve + final powered oracle
  for f in output/r6_rot_oracle_*.json; do
    [ -f "$f" ] && cp "$f" "$DST/"
  done
  # full-scale final evals (per-class tables live in eval.json)
  for d in output/r6_eval_full_*/; do
    name=$(basename "$d")
    for f in "$d"/*.json; do
      [ -f "$f" ] && cp "$f" "$DST/${name}_$(basename "$f")"
    done
  done
  # perf + guards
  for f in output/bench_train_mfu.json output/bench_graph_phases.json \
           output/r6_overfit_guard.json output/validate_tpu.json \
           output/probe_nn_all_classes.json; do
    [ -f "$f" ] && cp "$f" "$DST/"
  done
  # demo on the full-scale checkpoint
  if [ -d output/r6_demo ]; then
    mkdir -p "$DST/r6_demo"
    cp output/r6_demo/detections.json "$DST/r6_demo/" 2>/dev/null
    cp output/r6_demo/*-overlay.png "$DST/r6_demo/" 2>/dev/null
  fi
  # serve bench + key logs
  for f in experiments/logs/r6_serve_bench_b1.log experiments/logs/r6_serve_bench_b8.log \
           experiments/logs/r6_bench.log experiments/logs/r6_validate_tpu.log \
           experiments/logs/r6_bench_train_mfu.log; do
    [ -f "$f" ] && cp "$f" "$DST/$(basename "$f")"
  done
fi
