# Developer entry points (capability of the reference's Makefile targets).

.PHONY: test quicktest bench profile native clean golden docs

# Regenerate the generated documentation (docs/cli-reference.md).
docs:
	python scripts/gen_cli_reference.py

test:
	python -m pytest tests/ -q

quicktest:
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

# Perf sampling around the benchmark (wall/CPU/RSS -> measure_samples.tsv).
profile:
	scripts/measure.sh python bench.py

# Force-(re)build the native host library.
native:
	python -c "from deepchopper_tpu import native; assert native.available(); print('native OK')"

# Regenerate the frozen golden chop outputs (only when the chop contract
# intentionally changes).
golden:
	python tests/golden/make_golden.py

clean:
	rm -rf deepchopper_tpu/native/_host_ops_*.so .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
