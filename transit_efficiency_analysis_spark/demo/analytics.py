"""(placeholder — demos land incrementally)"""
