.PHONY: test test-fast bench bench-smoke native clean lint

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x

bench:
	python bench.py

bench-smoke:
	python bench.py --preset smoke --iters 5

native:
	g++ -O3 -std=c++17 -shared -fPIC -pthread \
	  -o svs_tpu/native/_fastpack.so svs_tpu/native/fastpack.cpp

lint:
	python -m compileall -q svs_tpu tests bench.py __graft_entry__.py

clean:
	rm -rf svs_tpu/native/_fastpack.so **/__pycache__ .pytest_cache
