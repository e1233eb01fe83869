from .excel_agent import ExcelAgent

__all__ = ["ExcelAgent"]
