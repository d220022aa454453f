from azoom.pipelines.oracle import heuristic_enhance, oracle_enhance

__all__ = ["heuristic_enhance", "oracle_enhance"]
