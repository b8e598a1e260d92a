# Build/test targets (the analog of the reference's feature-matrix Makefile).

.PHONY: test bench interop clean examples

test:
	python -m pytest tests/ -q

bench:
	python bench.py

interop:
	cmake -S interop -B interop/build -G Ninja
	cmake --build interop/build

examples:
	python examples/modulation.py /tmp
	python examples/bench_tables.py 5 /tmp/bench_tables.csv

clean:
	rm -rf interop/build
