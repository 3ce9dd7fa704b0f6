from tpulbm.validation.check import check_results

__all__ = ["check_results"]
