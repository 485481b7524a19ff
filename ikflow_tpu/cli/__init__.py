from ikflow_tpu.cli import bench_cmd, build_dataset_cmd, evaluate_cmd, solve_cmd, train_cmd  # noqa: F401
from ikflow_tpu.cli.main import main  # noqa: F401
