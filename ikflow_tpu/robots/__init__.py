from ikflow_tpu.robots.chain import Capsule, Joint, KinematicChain
from ikflow_tpu.robots.library import (
    get_robot,
    make_fetch,
    make_fetch_arm,
    make_panda,
    make_rizon4,
    robot_names,
)

__all__ = [
    "Capsule",
    "Joint",
    "KinematicChain",
    "get_robot",
    "make_fetch",
    "make_fetch_arm",
    "make_panda",
    "make_rizon4",
    "robot_names",
]
