ABANDON = object()
class Task: pass

def create_task(*a, **k):
    return Task()
