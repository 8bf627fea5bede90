# Developer entry points (see README.md).

.PHONY: test test-fast test-unit bench native sanitize overfit chipsession chipwait benchwait clean

test:
	python -m pytest tests/ -x -q

# everything except @pytest.mark.slow (overfit gates, R50 equality,
# family all-reduce compile gates) — measured r5 final tail session:
# 239 tests, 10:56 on this 1-core box (compile-bound; includes the
# export-artifact gates added after the 9:52 measurement)
test-fast:
	python -m pytest tests/ -x -q -m "not slow"

test-unit:
	python -m pytest tests/unit -x -q

bench:
	python bench.py

# unattended on-chip adjudication: chipcheck + traces + benchall with
# per-step logs that survive a mid-session tunnel drop
chipsession:
	bash tools/chip_session.sh

# background tunnel watcher: probes backend init every 10 min and runs
# the chip session unattended on the first successful probe
chipwait:
	nohup bash tools/chip_wait.sh /tmp/chip_session_auto \
	  >/tmp/chipwait.out 2>&1 & echo $$! > /tmp/chipwait.pid; \
	echo "watcher pid $$(cat /tmp/chipwait.pid); probes -> /tmp/chip_session_auto/probes.log"

# lighter watcher for AFTER an adjudication has landed: on first
# successful probe, re-confirm the promoted headline config (bench.py x3)
benchwait:
	nohup bash tools/bench_wait.sh /tmp/bench_wait \
	  >/tmp/benchwait.out 2>&1 & echo $$! > /tmp/benchwait.pid; \
	echo "watcher pid $$(cat /tmp/benchwait.pid); probes -> /tmp/bench_wait/probes.log"

# full on-chip validation ladder (run when the TPU tunnel is up):
# parity gates first, compact-kernel timing, then the headline bench.
# persistent compile cache across the many bench/parity invocations
chipcheck: export VIDDET_JAX_CACHE ?= /tmp/viddet_xla_cache
chipcheck:
	python tools/tpu_parity_check.py
	python tools/trace_tail.py --group compact
	python tools/trace_tail.py --group scores
	python tools/trace_tail.py --group topm
	python tools/trace_tail.py --group pairtopk
	VIDDET_COMPACT_KERNEL=1 python tools/tpu_parity_check.py
	VIDDET_SCORE_KERNEL=masked python tools/tpu_parity_check.py
	VIDDET_TOPM_KERNEL=rank python tools/tpu_parity_check.py
	VIDDET_PAIR_TOPK=det python tools/tpu_parity_check.py
	python bench.py
	VIDDET_COMPACT_KERNEL=1 python bench.py
	VIDDET_SCORE_KERNEL=masked python bench.py
	VIDDET_TOPM_KERNEL=rank python bench.py
	VIDDET_PAIR_TOPK=det python bench.py
	VIDDET_QUANT=int8 python bench.py

# full perf record, one command (run after chipcheck when the tunnel is up);
# every tool prints one JSON line — paste into BASELINE.md
benchall: export VIDDET_JAX_CACHE ?= /tmp/viddet_xla_cache
benchall:
	python bench.py
	python tools/ssd_bench.py
	python tools/frcnn_bench.py
	python tools/train_bench.py
	python tools/train_bench.py --family ssd
	python tools/train_bench.py --family frcnn
	python tools/serve_bench.py --concurrency 32 --requests 400
	python tools/stream_bench.py --streams 4
	python tools/stream_bench.py --decode-bypass
	python tools/stream_bench.py --decode-sweep 1,2,4
	python tools/loader_bench.py

# build the C++ host decode library (also auto-built on first import)
native:
	python -c "from viddet_tpu import native; assert native.available(), native.build_error(); print('native lib OK')"

sanitize:
	bash tools/native_sanitize.sh

overfit:
	python tools/overfit_check.py --family ssd
	python tools/overfit_check.py --family frcnn

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; \
	rm -f viddet_tpu/native/libviddet_decode.so viddet_tpu/native/.build_stamp
