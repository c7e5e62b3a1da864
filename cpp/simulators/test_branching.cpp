// Stochastic branching simulator (Poisson + fibonacci control flow) —
// counterpart of pyprob_cpp's test_branching
// (reference model: tests/test_inference.py:577-692).

#include "../ppx/ppx.h"

static int fib(int n) {
  if (n < 2) return n;
  int a = 0, b = 1;
  for (int i = 2; i <= n; i++) {
    int c = a + b;
    a = b;
    b = c;
  }
  return b;
}

int main(int argc, char** argv) {
  const char* address = argc > 1 ? argv[1] : "tcp://*:5555";
  ppx::Model model("Branching C++");
  model.serve(address, [](ppx::Model& m) {
    int r = static_cast<int>(m.sample(ppx::poisson(4.0), "r_addr").scalar());
    double l;
    if (r > 4) {
      l = 6.0;
    } else {
      double extra = m.sample(ppx::poisson(4.0), "extra_addr").scalar();
      l = 1.0 + fib(3 * r) + extra;
    }
    m.observe(ppx::poisson(l), "obs_addr", "obs");
    return ppx::Tensor(static_cast<double>(r));
  });
  return 0;
}
