from .kg_build import KGBuildResult, kg_build, run_extraction, run_graph_build

__all__ = ["KGBuildResult", "kg_build", "run_extraction", "run_graph_build"]
