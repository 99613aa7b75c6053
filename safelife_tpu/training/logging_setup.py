"""Logging configuration for training runs.

Parity: reference ``training/logging_setup.py`` — dictConfig console + run
logfile, an lru-cached per-episode-type data-logger factory with the
wandb-vs-tensorboard switch, and the save-code-as-artifact helper.
"""

import logging
import logging.config
import os
import subprocess as sp
from functools import lru_cache

from ..loggers import SafeLifeLogger
from .global_config import config


def setup_logging(data_dir, debug=False):
    """Configure the ``training``/``safelife_tpu`` loggers (console +
    optional ``training.log`` file in the run directory)."""
    handlers = ['console']
    logging_config = {
        'version': 1,
        'disable_existing_loggers': False,
        'formatters': {
            'simple': {
                'format': '{levelname:8s} {message}',
                'style': '{',
            },
            'dated': {
                'format': '{asctime} {levelname} ({filename}:{lineno}) '
                          '{message}',
                'style': '{',
                'datefmt': '%Y-%m-%d %H:%M:%S',
            },
        },
        'handlers': {
            'console': {
                'class': 'logging.StreamHandler',
                'level': 'INFO',
                'stream': 'ext://sys.stdout',
                'formatter': 'simple',
            },
        },
        'loggers': {
            'training': {
                'level': 'DEBUG' if debug else 'INFO',
                'propagate': False,
                'handlers': handlers,
            },
            'safelife_tpu': {
                'level': 'DEBUG' if debug else 'INFO',
                'propagate': False,
                'handlers': handlers,
            },
        },
        'root': {
            'level': 'WARNING',
            'handlers': handlers,
        },
    }

    if data_dir is not None:
        os.makedirs(data_dir, exist_ok=True)
        logfile = os.path.join(data_dir, 'training.log')
        if not os.path.exists(logfile):
            open(logfile, 'w').close()
        handlers.append('logfile')
        logging_config['handlers']['logfile'] = {
            'class': 'logging.FileHandler',
            'level': 'INFO',
            'formatter': 'dated',
            'filename': logfile,
        }

    logging.config.dictConfig(logging_config)
    return logging.getLogger('training')


@lru_cache(maxsize=128)
def setup_data_logger(data_dir, episode_type):
    """One cached :class:`SafeLifeLogger` per (run dir, episode type)."""
    if data_dir is not None:
        os.makedirs(data_dir, exist_ok=True)

    if config.get('_wandb'):
        import wandb
        summary_writer = False
    elif config.setdefault('run_type', 'train') == 'train':
        wandb = None
        summary_writer = 'auto'
    else:
        wandb = None
        summary_writer = False

    return SafeLifeLogger(
        data_dir, episode_type,
        summary_writer=summary_writer,
        wandb=wandb)


def save_code_to_wandb():
    """Upload all git-tracked source files as wandb code artifacts.

    Assumes the process runs from the repository root.
    """
    import wandb
    logger = logging.getLogger('training')

    result = sp.run(
        ["git", "ls-tree", "--full-tree", "-r", "--name-only", "HEAD"],
        stdout=sp.PIPE)
    if result.returncode != 0:
        logger.error("Could not retrieve list of tracked files.")
        return
    files = result.stdout.decode().strip().splitlines()
    core_files = wandb.Artifact('safelife_tpu_core', type='code')
    training_files = wandb.Artifact('safelife_tpu_training', type='code')
    for file in files:
        if file.rpartition('.')[2] in ('py', 'c', 'cpp', 'h', 'yaml'):
            if file.startswith('safelife_tpu/training'):
                training_files.add_file(file, name=file)
            elif file.startswith('safelife_tpu'):
                core_files.add_file(file, name=file)
    wandb.run.log_artifact(core_files)
    wandb.run.log_artifact(training_files)
