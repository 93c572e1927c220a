"""Monaco (MoST) real-network scenario registration.

The reference parses nothing itself: it ships a prebuilt most.net.xml +
most.add.xml and drives SUMO (/root/reference/envs/real_net_env.py,
real_net/data/build_file.py). Our compiler (:mod:`real_net_impl`) parses
those static assets once into NetworkSpec arrays.
"""

from __future__ import annotations

from . import register


@register("real_net")
def build_real_net(env_config):
    from .real_net_impl import build

    return build(env_config)
