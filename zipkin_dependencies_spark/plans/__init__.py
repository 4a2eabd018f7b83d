from .job import DependencyLinksJob, JobConfig

__all__ = ["DependencyLinksJob", "JobConfig"]
