// Exercises explicit addresses, names, control flags and tags —
// counterpart of pyprob_cpp's test_set_defaults_and_addresses.

#include "../ppx/ppx.h"

int main(int argc, char** argv) {
  const char* address = argc > 1 ? argv[1] : "tcp://*:5555";
  ppx::Model model("Set defaults and addresses C++");
  model.serve(address, [](ppx::Model& m) {
    double a =
        m.sample(ppx::normal(0.0, 1.0), "address_a", "name_a").scalar();
    // uncontrolled auxiliary randomness
    double b = m.sample(ppx::normal(0.0, 1.0), "address_b", "name_b",
                        /*control=*/false)
                   .scalar();
    m.tag(ppx::Tensor(a + b), "address_tag", "sum_ab");
    m.observe(ppx::normal(a, 1.0), "address_obs", "obs0");
    return ppx::Tensor(a);
  });
  return 0;
}
