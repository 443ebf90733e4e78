# Container image for the raytracer_tpu server.
#
# NOTE: TPU access requires a host with TPU runtime/PJRT libraries mounted
# (e.g. a Cloud TPU VM base image); this file captures the app layer.  The
# CPU fallback works anywhere.
FROM python:3.12-slim AS base

RUN apt-get update && apt-get install -y --no-install-recommends g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY raytracer_tpu/ raytracer_tpu/
COPY native/ native/
COPY scenes/ scenes/
COPY clients/ clients/
COPY config.toml .

RUN pip install --no-cache-dir "jax[cpu]" flax pillow websockets aiohttp \
    && make -C native

ENV PORT=8080
EXPOSE 8080 8090
CMD ["python", "-m", "raytracer_tpu.server.main", "scenes", "--http-port", "8090"]
