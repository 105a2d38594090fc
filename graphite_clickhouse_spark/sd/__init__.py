"""Service discovery — the reference's sd/ package (sd/register.go,
sd/nginx/nginx.go, sd/utils/utils.go).

The serving process registers itself in a consul KV namespace consumed by
nginx-upsync (https://github.com/weibocom/nginx-upsync-module) so an nginx
fronting a fleet of query nodes learns backends and weights dynamically.
In the Spark build the registered endpoint is the driver's HTTP listener
(`python -m graphite_clickhouse_spark --listen`); the weight still tracks
the driver host's normalized load average, which is the right health
signal — the driver is where requests queue.
"""

from .load_avg import normalized_load, weight
from .nginx import NginxSD
from .register import Registrar, cleanup, new_sd
from .utils import KV, NotFoundError

__all__ = [
    "KV",
    "NginxSD",
    "NotFoundError",
    "Registrar",
    "cleanup",
    "new_sd",
    "normalized_load",
    "weight",
]
