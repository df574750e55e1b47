# Default runtime settings (counterpart of the reference's
# configs/_base_/default_runtime.py)
runtime = dict(
    seed=0,
    log_interval=50,
    ckpt_interval=10,
    eval_interval=10,
    save_best='AP',
    work_dir='work_dirs/default',
)
