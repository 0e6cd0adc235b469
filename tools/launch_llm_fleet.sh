#!/usr/bin/env bash
# Launch a fleet of OpenAI-compatible LLM servers (vLLM) + one extraction
# worker per server — equivalent of the reference's LaunchMultiGPUFlex.sh.
#
# Usage: tools/launch_llm_fleet.sh REPORTS_CSV OUT_DIR N_INSTANCES [MODEL]
set -euo pipefail
REPORTS="$1"; OUT="$2"; N="${3:-1}"
MODEL="${4:-meta-llama/Llama-3.1-70B-Instruct-AWQ}"
BASE_PORT="${BASE_PORT:-8000}"

for i in $(seq 0 $((N - 1))); do
    port=$((BASE_PORT + i))
    CUDA_VISIBLE_DEVICES=$i vllm serve "$MODEL" --port "$port" \
        --quantization awq &>"$OUT/vllm_$i.log" &
done

# wait for the APIs to come up
for i in $(seq 0 $((N - 1))); do
    port=$((BASE_PORT + i))
    until curl -sf "http://localhost:$port/v1/models" >/dev/null; do sleep 5; done
done

for i in $(seq 0 $((N - 1))); do
    port=$((BASE_PORT + i))
    python -m rsuper_tpu.report_extraction.run \
        --reports "$REPORTS" --out_dir "$OUT" \
        --base_url "http://localhost:$port/v1" --model "$MODEL" \
        --parts "$N" --part "$i" &
done
wait
python -m rsuper_tpu.report_extraction.run --reports "$REPORTS" \
    --out_dir "$OUT" --postprocess_only
