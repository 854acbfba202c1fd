# jlama-tpu serving image (parity: reference Dockerfile, temurin-21 + profiler)
# Run on TPU VMs (the libtpu wheel comes from the jax[tpu] extra).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make curl && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY jlama_tpu ./jlama_tpu
COPY native ./native

RUN pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        aiohttp jinja2 regex numpy && \
    pip install --no-cache-dir -e .

# pre-build the native kernels
RUN g++ -O3 -shared -fPIC -std=c++17 -pthread native/blockq.cpp -o native/libjlamaq.so

ENV JLAMA_MODEL_HOME=/models
VOLUME /models
EXPOSE 8080

ENTRYPOINT ["python", "-m", "jlama_tpu.cli"]
CMD ["serve", "--help"]
