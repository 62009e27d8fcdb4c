// GridFunction (.gf) interop harness for tests/test_gf_interop.py.
//
// Modes:
//   write <mesh> <order> <out.gf>   — project the deterministic polynomial
//       f(x) = 1 + 2x + 3x^2 + 0.5y - y^2 + 0.25xy (+ z terms in 3D)
//       onto H1_p and save with GridFunction::Save (fem/gridfunc.cpp:4142).
//   read  <mesh> <order> <in.gf>    — load a .gf (fem/gridfunc.cpp:40) on
//       the same space and print the max-norm difference against that same
//       projection, plus the first 5 dof values.
//
// Build (after the mfem library, see tools/mfem_parity.cpp):
//   g++ -O2 -std=c++17 tools/mfem_gf_io.cpp -I/root/reference \
//       -I/tmp/mfem-build -L/tmp/mfem-build -lmfem -o /tmp/mfem_gf_io

#include "mfem.hpp"
#include <fstream>
#include <iostream>

using namespace mfem;

static double poly(const Vector &x)
{
   double v = 1.0 + 2.0 * x(0) + 3.0 * x(0) * x(0)
              + 0.5 * x(1) - x(1) * x(1) + 0.25 * x(0) * x(1);
   if (x.Size() > 2)
   {
      v += 0.75 * x(2) + 0.3 * x(2) * x(2) - 0.4 * x(0) * x(2);
   }
   return v;
}

int main(int argc, char *argv[])
{
   if (argc < 5)
   {
      std::cerr << "usage: " << argv[0] << " write|read mesh order file.gf\n";
      return 1;
   }
   std::string mode = argv[1];
   Mesh mesh(argv[2], 1, 1);
   int order = std::atoi(argv[3]);

   H1_FECollection fec(order, mesh.Dimension());
   FiniteElementSpace fespace(&mesh, &fec);
   FunctionCoefficient f(poly);

   if (mode == "write")
   {
      GridFunction x(&fespace);
      x.ProjectCoefficient(f);
      std::ofstream out(argv[4]);
      out.precision(16);
      x.Save(out);
   }
   else
   {
      std::ifstream in(argv[4]);
      GridFunction x(&mesh, in);
      GridFunction y(&fespace);
      y.ProjectCoefficient(f);
      y -= x;
      std::cout.precision(16);
      std::cout << "ndof " << fespace.GetTrueVSize()
                << " maxdiff " << y.Normlinf() << "\nhead";
      for (int i = 0; i < 5 && i < x.Size(); i++)
      {
         std::cout << " " << x(i);
      }
      std::cout << std::endl;
   }
   return 0;
}
